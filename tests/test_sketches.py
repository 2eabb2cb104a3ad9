"""Sketches / deterministic sampling / discrete quantiles
(dataxray/functions/sketches.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.sketches import (
    grouped_quantiles,
    hll_distinct,
    hll_estimate,
    hll_partial_registers,
    quantile_disc,
    sample_hash,
    sample_threshold_sql,
    splitmix64,
    splitmix64_sql,
    stratified_sample,
)


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data

    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_splitmix64_sql_parity():
    """The HUGEINT limb-arithmetic SQL expression must reproduce the numpy
    kernel bit-exactly over random and boundary inputs."""
    rng = np.random.default_rng(1)
    xs = np.concatenate([
        np.array([0, 1, 2**31, 2**53, 2**62, 2**63 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, 500).astype(np.uint64),
    ])
    want = splitmix64(xs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(x),) for x in xs])
    got = con.execute(
        f"SELECT {splitmix64_sql('i')} FROM t ORDER BY rowid").fetchall()
    assert all(int(g[0]) == int(w) for g, w in zip(got, want))


def test_quantile_disc_parity_with_duckdb():
    """Lock the ceil(q*n)-1 index formula against DuckDB's quantile_disc
    across group sizes and q values (incl. exact-boundary q*n)."""
    rng = np.random.default_rng(2)
    con = duckdb.connect()
    for n in [1, 2, 3, 4, 5, 7, 8, 10, 16, 33, 100]:
        vals = np.sort(rng.integers(-1000, 1000, n))
        con.execute("DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE t(x BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in vals])
        for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0):
            want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
            assert quantile_disc(vals, q) == want, (n, q)


def test_hll_accuracy_and_merge_associativity():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 2**62, 60_000)
    exact = len(np.unique(vals))
    h = splitmix64(vals)
    regs = hll_partial_registers(h, 12)
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05  # 3 sigma at p=12 is ~4.9%
    # partial merge (max) must equal the one-shot registers for any split
    for k in (2, 7):
        parts = np.array_split(h, k)
        merged = np.zeros(1 << 12, dtype=np.int64)
        for p_ in parts:
            np.maximum(merged, hll_partial_registers(p_, 12), out=merged)
        assert (merged == regs).all()


def test_hll_distinct_dataset_empty_block_safe():
    """blocks >> rows forces empty batches through the partial stage —
    the r03 failure shape."""
    t = pa.table({"v": pa.array([1, 2, 3, 2, 1], pa.int64())})
    est = hll_distinct(_ds(t, blocks=16), "v", p=12)
    assert est == 3  # tiny cardinality -> linear counting is exact-ish


def test_sample_hash_deterministic_and_unbiased():
    t = pa.table({"k": pa.array(np.arange(20_000), pa.int64())})
    out1 = sample_hash(_ds(t, 8), "k", 0.1).to_pandas()
    out2 = sample_hash(_ds(t, 3), "k", 0.1).to_pandas()
    assert sorted(out1["k"]) == sorted(out2["k"])  # block-layout invariant
    assert 0.08 < len(out1) / 20_000 < 0.12
    # SQL predicate reproduces the exact row set
    con = duckdb.connect()
    con.register("t", t)
    sql_rows = con.execute(
        f"SELECT k FROM t WHERE {sample_threshold_sql('k', 0.1)} ORDER BY k"
    ).fetchdf()["k"].tolist()
    assert sql_rows == sorted(out1["k"].tolist())


def test_stratified_sample_matches_bruteforce():
    rng = np.random.default_rng(4)
    n = 5000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n)),
        "k": pa.array(np.arange(n), pa.int64()),
    })
    out = (stratified_sample(_ds(t, 16), "g", "k", 25)
           .to_pandas().sort_values(["g", "k"]).reset_index(drop=True))
    # brute force: smallest 25 hashes per stratum
    h = splitmix64(np.arange(n).astype(np.uint64))
    import pandas as pd

    df = pd.DataFrame({"g": t["g"].to_pylist(), "k": np.arange(n), "h": h})
    want = (df.sort_values(["h", "k"]).groupby("g").head(25)
            [["g", "k"]].sort_values(["g", "k"]).reset_index(drop=True))
    assert out.groupby("g").size().tolist() == [25, 25, 25]
    assert (out[["g", "k"]].values == want.values).all()


def test_grouped_quantiles_dataset():
    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y"], 2000)),
        "v": pa.array(rng.integers(0, 10_000, 2000), pa.int64()),
    })
    out = grouped_quantiles(_ds(t, 8), "g", "v",
                            {"p50": 0.5, "p95": 0.95}).to_pandas()
    df = t.to_pandas()
    for _, row in out.iterrows():
        vals = np.sort(df[df["g"] == row["g"]]["v"].to_numpy())
        assert row["p50"] == quantile_disc(vals, 0.5)
        assert row["p95"] == quantile_disc(vals, 0.95)
        assert row["n_rows"] == len(vals)


def test_stratified_sample_fewer_rows_than_n():
    t = pa.table({"g": pa.array(["a", "a", "b"]),
                  "k": pa.array([1, 2, 3], pa.int64())})
    out = stratified_sample(_ds(t, 8), "g", "k", 10).to_pandas()
    assert len(out) == 3  # strata smaller than n keep all rows


def test_cms_accuracy_and_order_independence():
    from dataxray.functions.sketches import cms_counts, cms_partial, cms_query

    rng = np.random.default_rng(6)
    # zipf-ish: user 0 hot, tail sparse
    vals = np.concatenate([np.zeros(5000, dtype=np.int64),
                           rng.integers(1, 500, 5000)])
    exact = np.array([(vals == q).sum() for q in range(20)])
    t = pa.table({"u": pa.array(vals, pa.int64())})
    est = cms_counts(_ds(t, 16), "u", np.arange(20, dtype=np.int64))
    # CM estimates are upper bounds within eps*N w.h.p.
    assert (est >= exact).all()
    assert (est <= exact + 2 * len(vals) / 2048 + 10).all()
    # merge order independence: split partials arbitrarily, same counters
    one = cms_partial(vals, 4, 2048)
    parts = np.array_split(vals, 7)
    summed = sum(cms_partial(p_, 4, 2048) for p_ in parts[::-1])
    assert (one == summed).all()
    assert (cms_query(one, np.arange(20)) == est).all()
