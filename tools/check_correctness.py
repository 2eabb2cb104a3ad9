"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and compare against oracle_sql() via DuckDB — row count, sorted
column names, and order-insensitive values.

Runs at the DRIVER's parallelism (num_cpus=32) by default — the round-3 gate
failure was a parallelism-dependent bug (empty batches at 32 CPUs inferring
null-typed columns) that an 8-CPU mirror could never see. Override with
CHECK_CPUS=8 to sweep lower parallelism too.

Usage: [CHECK_CPUS=N] python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(wv.dtype, np.floating):
                ok = np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9,
                                 equal_nan=True)
                exact = (gv.astype(float).fillna(-1) == wv.astype(float).fillna(-1)).all()
                if not ok:
                    problems.append(f"col {c}: float values differ beyond 1e-9")
                elif not exact:
                    problems.append(f"col {c}: WARN float not bit-identical (within 1e-9)")
            else:
                if not gv.astype(str).equals(wv.astype(str)):
                    bad = (gv.astype(str) != wv.astype(str)).to_numpy().nonzero()[0][:3]
                    problems.append(
                        f"col {c}: values differ, e.g. rows {bad.tolist()} "
                        f"got={gv.iloc[bad].tolist()} want={wv.iloc[bad].tolist()}"
                    )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("CHECK_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    pymodels = getattr(entrymod, "reference_models", dict)()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            if name in pymodels:
                want = to_pandas(pymodels[name](sf_dir))
                problems = compare(name, got, want)
                hard = [p for p in problems if not p.startswith("col") or "WARN" not in p]
                if hard:
                    print(f"[FAIL] {name} (py-model):")
                    for p in problems:
                        print(f"    {p}")
                    failures += 1
                else:
                    print(f"[ok/py-model] {name}: {len(got)} rows")
            else:
                print(f"[rows-only] {name}: {len(got)} rows, cols {sorted(got.columns)}")
            continue
        want = con.execute(oracles[name]).fetchdf()
        problems = compare(name, got, want)
        hard = [p for p in problems if not p.startswith("col") or "WARN" not in p]
        if hard:
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"    {p}")
            failures += 1
        else:
            note = "; ".join(p for p in problems if "WARN" in p)
            print(f"[ok] {name}: {len(got)} rows" + (f"  ({note})" if note else ""))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
