"""Driver-contract regression guard: entry() + a sample of queries() vs their
DuckDB oracles at sf0.001 (the full gate is tools/check_correctness.py at
sf0.01 — run it after touching reports.py or __ray_entry__.py)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
SAMPLE = ["cdc_lww_replay", "dx_substr", "agg_pricing_summary", "knn_cosine_top5",
          "window_tumbling", "dedup_exact_groups"]


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_returns_state(entrymod):
    out = entrymod.entry()
    assert out.num_rows > 0
    assert out.schema.names == ["url", "txn_id", "warc_ts", "text", "lang"]


def test_every_oracle_has_a_query(entrymod):
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(entrymod, con, name):
    import pyarrow as pa
    import ray.data

    got = entrymod.queries()[name](SF)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_entry_contract_key_consistency():
    """Every oracle/model key maps to a real query; no query is silently
    uncheckable (each has a SQL oracle or a py-model)."""
    import __ray_entry__ as e

    q = set(e.queries())
    o = set(e.oracle_sql())
    m = set(e.reference_models())
    assert o <= q, o - q
    assert m <= q, m - q
    assert not (o & m), o & m  # exactly one checker per query
    unchecked = q - o - m
    assert not unchecked, unchecked


def test_sql_graduates_match_pymodel(entrymod):
    """repetition_stats / pack_bins graduated from py-model to SQL oracles
    in round 5; the py-models stay as an independent second witness — the
    Ray result must match them value-for-value."""
    import numpy as np

    from dataxray import oracle_models as M

    for name in ["repetition_stats", "pack_bins"]:
        got = entrymod.queries()[name](SF)
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = getattr(M, name)(SF)
        want = want.to_pandas() if not isinstance(want, pd.DataFrame) else want
        cols = sorted(got.columns)
        assert sorted(want.columns) == cols
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(g) == len(w)
        for c in cols:
            if np.issubdtype(g[c].dtype, np.floating):
                assert np.allclose(g[c], w[c], rtol=0, atol=1e-9), (name, c)
            else:
                assert g[c].astype(str).equals(w[c].astype(str)), (name, c)
