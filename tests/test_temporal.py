"""Distributed as-of join vs a single-process pandas merge_asof reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _mk(seed=5, n_left=400, n_right=300, n_keys=17):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame({
        "lid": np.arange(n_left, dtype=np.int64),
        "k": rng.integers(0, n_keys, n_left).astype(np.int64),
        "lts": base + pd.to_timedelta(rng.integers(0, 10**6, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_right, dtype=np.int64) + 10_000,
        "rk": rng.integers(0, n_keys + 4, n_right).astype(np.int64),  # some keys unmatched
        "rts": base + pd.to_timedelta(rng.integers(0, 10**6, n_right), unit="s"),
        "rval": rng.normal(size=n_right),
    })
    # determinism contract: at most one right row per (key, ts)
    right = right.drop_duplicates(["rk", "rts"]).reset_index(drop=True)
    return left, right


def _ref(left, right, **kw):
    out = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts", right_on="rts", left_by="k", right_by="rk", **kw)
    return out.sort_values("lid").reset_index(drop=True)


def _run(left, right, **kw):
    from dataxray.functions.temporal import asof_join

    out = asof_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)),
        ray.data.from_arrow(pa.Table.from_pandas(right)),
        on_left="lts", on_right="rts", by_left="k", by_right="rk",
        right_cols=["rid", "rval"], num_buckets=5, **kw)
    df = out.to_pandas().sort_values("lid").reset_index(drop=True)
    return df


def test_asof_backward_matches_pandas():
    left, right = _mk()
    got = _run(left, right)
    want = _ref(left, right, direction="backward")
    pd.testing.assert_series_equal(got["rid"], want["rid"], check_dtype=False)
    pd.testing.assert_series_equal(got["rval"], want["rval"], check_dtype=False)
    assert got["rid"].isna().any()  # unmatched keys stay null (left outer)


def test_asof_forward_strict_and_tolerance():
    left, right = _mk(seed=9)
    for kw in (
        dict(direction="forward"),
        dict(direction="backward", allow_exact_matches=False),
        dict(direction="backward", tolerance=pd.Timedelta("2d")),
    ):
        got = _run(left, right, **kw)
        want = _ref(left, right, **kw)
        pd.testing.assert_series_equal(got["rid"], want["rid"],
                                       check_dtype=False), kw


def test_asof_rejects_column_collision():
    import pytest

    from dataxray.functions.temporal import asof_join

    left, right = _mk()
    right = right.rename(columns={"rid": "lid"})
    with pytest.raises(ValueError, match="overlapping"):
        asof_join(ray.data.from_arrow(pa.Table.from_pandas(left)),
                  ray.data.from_arrow(pa.Table.from_pandas(right)),
                  on_left="lts", on_right="rts", by_left="k", by_right="rk",
                  right_cols=["lid"])


def test_interval_join_matches_bruteforce():
    """Keyed range join vs O(n*m) reference: overlapping windows, a point
    matching several intervals, unmatched keys dropping out."""
    left, right = _mk(seed=13, n_left=300, n_right=60, n_keys=7)
    right = right.rename(columns={"rts": "rstart"})
    right["rend"] = right["rstart"] + pd.to_timedelta(
        np.random.default_rng(3).integers(1, 4 * 10**5, len(right)), unit="s")

    from dataxray.functions.temporal import interval_join

    out = interval_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)),
        ray.data.from_arrow(pa.Table.from_pandas(right)),
        on="lts", start_col="rstart", end_col="rend",
        by_left="k", by_right="rk", point_cols=["lid"],
        interval_cols=["rid"], num_buckets=4)
    got = sorted(map(tuple, out.to_pandas()[["lid", "rid"]].values.tolist()))

    want = []
    for _, lr in left.iterrows():
        for _, rr in right.iterrows():
            if lr.k == rr.rk and rr.rstart <= lr.lts < rr.rend:
                want.append((lr.lid, rr.rid))
    assert got == sorted(want) and len(want) > 0
    assert any(sum(1 for a, _ in want if a == lid) > 1
               for lid in {a for a, _ in want})  # some point hit 2+ windows


def test_reserved_internal_names_rejected():
    import pytest

    from dataxray.functions.temporal import asof_join, interval_join

    left, right = _mk()
    bad = left.rename(columns={"lid": "_asof_key"})
    with pytest.raises(ValueError, match="reserved"):
        asof_join(ray.data.from_arrow(pa.Table.from_pandas(bad)),
                  ray.data.from_arrow(pa.Table.from_pandas(right)),
                  on_left="lts", on_right="rts", by_left="k", by_right="rk",
                  right_cols=["rid", "rval"])
    badr = right.rename(columns={"rval": "_pts"})
    with pytest.raises(ValueError, match="reserved"):
        interval_join(ray.data.from_arrow(pa.Table.from_pandas(left)),
                      ray.data.from_arrow(pa.Table.from_pandas(badr)),
                      on="lts", start_col="rts", end_col="rts",
                      by_left="k", by_right="rk",
                      point_cols=["lid"], interval_cols=["rid"])
