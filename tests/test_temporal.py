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


def _mk_intervals(seed=9, n_pts=600, n_iv=120, n_keys=13, horizon=10**6):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    pts = pd.DataFrame({
        "pid": np.arange(n_pts, dtype=np.int64),
        "k": rng.integers(0, n_keys, n_pts).astype(np.int64),
        "pts_ts": base + pd.to_timedelta(rng.integers(0, horizon, n_pts), unit="s"),
    })
    start = rng.integers(0, horizon, n_iv)
    length = rng.integers(1, horizon // 20, n_iv)
    iv = pd.DataFrame({
        "iid": np.arange(n_iv, dtype=np.int64) + 50_000,
        "ik": rng.integers(0, n_keys, n_iv).astype(np.int64),
        "ivs": base + pd.to_timedelta(start, unit="s"),
        "ive": base + pd.to_timedelta(start + length, unit="s"),
    })
    return pts, iv


def _brute_pairs(pts, iv, keyed=True):
    out = set()
    for _, p in pts.iterrows():
        for _, r in iv.iterrows():
            if keyed and p["k"] != r["ik"]:
                continue
            if r["ivs"] <= p["pts_ts"] < r["ive"]:
                out.add((int(p["pid"]), int(r["iid"])))
    return out


def test_time_bucketed_interval_join_unkeyed_matches_bruteforce():
    from dataxray.functions.temporal import interval_join_time_bucketed

    pts, iv = _mk_intervals()
    got = interval_join_time_bucketed(
        ray.data.from_arrow(pa.Table.from_pandas(pts)),
        ray.data.from_arrow(pa.Table.from_pandas(iv)),
        on="pts_ts", start_col="ivs", end_col="ive",
        point_cols=["pid"], interval_cols=["iid"]).to_pandas()
    want = _brute_pairs(pts, iv, keyed=False)
    assert set(zip(got["pid"], got["iid"])) == want and len(want) > 0


def test_time_bucketed_interval_join_keyed_matches_keyed_variant():
    from dataxray.functions.temporal import interval_join, interval_join_time_bucketed

    pts, iv = _mk_intervals()
    a = interval_join(
        ray.data.from_arrow(pa.Table.from_pandas(pts)),
        ray.data.from_arrow(pa.Table.from_pandas(iv)),
        on="pts_ts", start_col="ivs", end_col="ive",
        by_left="k", by_right="ik",
        point_cols=["pid"], interval_cols=["iid"]).to_pandas()
    b = interval_join_time_bucketed(
        ray.data.from_arrow(pa.Table.from_pandas(pts)),
        ray.data.from_arrow(pa.Table.from_pandas(iv)),
        on="pts_ts", start_col="ivs", end_col="ive",
        key_left="k", key_right="ik",
        point_cols=["pid"], interval_cols=["iid"]).to_pandas()
    assert set(zip(a["pid"], a["iid"])) == set(zip(b["pid"], b["iid"]))
    assert len(a) == len(_brute_pairs(pts, iv, keyed=True))


def test_time_bucketed_avoids_hot_key_candidate_blowup():
    """One hot key ruins the keyed variant (every row lands in ONE bucket →
    |P|x|I| candidates in one task); time bucketing bounds per-task
    candidates by temporal co-occurrence. Results stay identical."""
    from dataxray.functions.temporal import interval_join, interval_join_time_bucketed

    pts, iv = _mk_intervals(n_keys=1)  # all rows share key 0
    a = interval_join(
        ray.data.from_arrow(pa.Table.from_pandas(pts)),
        ray.data.from_arrow(pa.Table.from_pandas(iv)),
        on="pts_ts", start_col="ivs", end_col="ive",
        by_left="k", by_right="ik",
        point_cols=["pid"], interval_cols=["iid"]).to_pandas()
    b = interval_join_time_bucketed(
        ray.data.from_arrow(pa.Table.from_pandas(pts)),
        ray.data.from_arrow(pa.Table.from_pandas(iv)),
        on="pts_ts", start_col="ivs", end_col="ive",
        key_left="k", key_right="ik",
        point_cols=["pid"], interval_cols=["iid"]).to_pandas()
    assert set(zip(a["pid"], a["iid"])) == set(zip(b["pid"], b["iid"]))

    # measure the candidate products each strategy materializes per task
    keyed_candidates = len(pts) * len(iv)  # one key -> one bucket
    W = int((iv["ive"] - iv["ivs"]).max().total_seconds())
    pb = (pts["pts_ts"].astype("int64") // 10**9 // W).value_counts()
    s = iv["ivs"].astype("int64") // 10**9 // W
    e = (iv["ive"].astype("int64") // 10**9 - 1) // W
    ib = pd.Series(np.concatenate(
        [np.arange(a_, b_ + 1) for a_, b_ in zip(s, e)])).value_counts()
    per_bucket = (pb * ib).dropna()
    assert per_bucket.max() < keyed_candidates / 4
    assert per_bucket.sum() < keyed_candidates / 2
