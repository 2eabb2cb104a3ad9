"""KMV bottom-k sketch: layout invariance + brute-force parity."""
import numpy as np
import pyarrow as pa
import pytest


def _brute_bottom_k(groups, keys, k):
    from dataxray.functions.sketches import splitmix64

    out = {}
    for g in set(groups):
        ks = np.unique(np.array([x for gg, x in zip(groups, keys)
                                 if gg == g], dtype=np.int64))
        hs = np.unique(splitmix64(ks))
        out[g] = sorted(hs.tolist())[:k]
    return out


@pytest.mark.parametrize("blocks", [1, 7, 32])
def test_kmv_by_group_layout_invariant(ray_session, blocks):
    import ray.data

    from dataxray.functions.sketches import kmv_by_group

    rng = np.random.default_rng(7)
    n = 5000
    groups = rng.choice(["a", "b", "c"], size=n).tolist()
    keys = rng.integers(0, 900, size=n).tolist()  # heavy duplication
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(groups), "k": pa.array(keys, pa.int64()),
    })).repartition(blocks)
    sk = kmv_by_group(ds, "g", "k", k=64)
    got = {}
    for g, h in zip(sk["g"].to_pylist(), sk["h"].to_pylist()):
        got.setdefault(g, []).append(h)
    want = _brute_bottom_k(groups, keys, 64)
    assert {g: sorted(v) for g, v in got.items()} == want


def test_kmv_estimate_exact_below_k_and_unbiased_form():
    from dataxray.functions.sketches import kmv_estimate

    assert kmv_estimate(10, 123456, 64) == 10.0
    # at n_k == k the estimate is (k-1)/theta
    kth = np.uint64(1) << np.uint64(60)  # theta = 1/16
    est = kmv_estimate(64, int(kth), 64)
    assert abs(est - 63 * 16) < 1e-6


def test_rolling_avg_frame_edges(ray_session):
    """First rows of a partition average over the short frame."""
    import ray.data

    from dataxray.pipelines import reports

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([9, 9, 9, 9, 9], pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 10.0]),
    })
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = reports.rolling_avg_value(d).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
    assert out["roll_avg"].tolist() == [1.0, 1.5, 2.0, 2.5, 4.75]
