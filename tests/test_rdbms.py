"""sqlite-backed RDBMS reader/writer: splitPk range planning, type map,
writeMode insert/replace/update, batch-failure dirty fallback, pre/postSql —
the CommonRdbmsReader/Writer semantics exercised for real."""

import os
import sqlite3

import pyarrow as pa
import ray.data

from dataxray.sources import rdbms

SF = "/root/testdata/sf0.001"


def _mkdb(tmp_path, rows):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, name TEXT, score REAL)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.commit()
    con.close()
    return db


def test_split_planning_and_ranged_read(tmp_path):
    rows = [(i, f"n{i}", i * 0.5) for i in range(100)]
    db = _mkdb(tmp_path, rows)
    clauses = rdbms.plan_splits(db, "t", "k", 4)
    assert len(clauses) == 5  # 4 ranges + IS NULL split
    assert clauses[-1].endswith("k IS NULL")
    ds = rdbms.read_table(db, "t", split_pk="k", num_splits=4)
    got = sorted(ds.take_all(), key=lambda r: r["k"])
    assert [(r["k"], r["name"], r["score"]) for r in got] == rows
    # type map: INTEGER->int64, TEXT->string, REAL->float64
    sch = rdbms.table_schema(db, "t")
    assert sch.field("k").type == pa.int64()
    assert sch.field("name").type == pa.string()
    assert sch.field("score").type == pa.float64()


def test_where_pushdown_and_column_pruning(tmp_path):
    db = _mkdb(tmp_path, [(i, f"n{i}", float(i)) for i in range(20)])
    ds = rdbms.read_table(db, "t", columns=["k"], split_pk="k", num_splits=2,
                          where="k >= 10")
    got = sorted(r["k"] for r in ds.take_all())
    assert got == list(range(10, 20))


def test_write_modes(tmp_path):
    db = str(tmp_path / "w.db")
    schema = pa.schema([("k", pa.int64()), ("name", pa.string())])
    base = ray.data.from_items([{"k": 1, "name": "a"}, {"k": 2, "name": "b"}])
    rdbms.write_table(base, db, "t", "insert", conflict_pk="k",
                      create_from_schema=schema)

    # replace: whole-row last-writer-wins (REPLACE INTO analog)
    rdbms.write_table(ray.data.from_items([{"k": 2, "name": "B2"}]),
                      db, "t", "replace", conflict_pk="k")
    # update: ON CONFLICT DO UPDATE (ON DUPLICATE KEY UPDATE analog)
    rdbms.write_table(ray.data.from_items([{"k": 1, "name": "A3"},
                                           {"k": 3, "name": "c"}]),
                      db, "t", "update", conflict_pk="k")
    got = sorted(rdbms.read_table(db, "t").take_all(), key=lambda r: r["k"])
    assert [(r["k"], r["name"]) for r in got] == [(1, "A3"), (2, "B2"), (3, "c")]


def test_batch_failure_falls_back_to_rows_and_dirty(tmp_path):
    db = str(tmp_path / "d.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, name TEXT NOT NULL)")
    con.close()
    dirty = str(tmp_path / "dirty")
    ds = ray.data.from_items([{"k": 1, "name": "ok"},
                              {"k": 2, "name": None},  # NOT NULL violation
                              {"k": 3, "name": "ok3"}])
    rep = rdbms.write_table(ds, db, "t", "insert", dirty_dir=dirty,
                            concurrency=1)
    assert rep == {"rows_written": 2, "rows_failed": 1}
    from dataxray.errors import dirty_count

    assert dirty_count(dirty) == 1
    got = sorted(r["k"] for r in rdbms.read_table(db, "t").take_all())
    assert got == [1, 3]


def test_pre_post_sql_with_table_placeholder(tmp_path):
    db = str(tmp_path / "p.db")
    schema = pa.schema([("k", pa.int64())])
    ds = ray.data.from_items([{"k": 7}])
    rdbms.write_table(ds, db, "t", "insert", create_from_schema=schema,
                      pre_sql=["DELETE FROM @table"],
                      post_sql=["CREATE INDEX IF NOT EXISTS idx_k ON @table(k)"])
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 1
    idx = con.execute("PRAGMA index_list(t)").fetchall()
    con.close()
    assert any("idx_k" in str(r) for r in idx)


def test_cli_rdbms_job(tmp_path):
    """job.json round trip: parquet → rdbmswriter, then rdbmsreader → stream."""
    from dataxray.cli import run_job

    db = str(tmp_path / "cli.db")
    job1 = {"job": {"content": [{
        "reader": {"name": "parquetreader", "parameter": {
            "path": f"{SF}/nation.parquet", "column": ["n_nationkey", "n_name"]}},
        "writer": {"name": "rdbmswriter", "parameter": {
            "path": db, "table": "nation", "createTable": True,
            "conflictPk": "n_nationkey"}},
    }]}}
    rep1 = run_job(job1)
    assert rep1["content"][0]["rows"] == 25
    job2 = {"job": {"content": [{
        "reader": {"name": "rdbmsreader", "parameter": {
            "path": db, "table": "nation", "splitPk": "n_nationkey"}},
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}}
    rep2 = run_job(job2)
    assert rep2["content"][0]["rows"] == 25


def test_session_config_applied_per_connection(tmp_path):
    """sessionConfig analog (DBUtil.dealWithSessionConfig): per-connection
    statements run before any work, on the driver connection AND inside
    every writer task's connection."""
    import sqlite3

    import ray.data

    from dataxray.sources import rdbms

    db = str(tmp_path / "s.db")
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array(["a", "b", "c"])})
    rep = rdbms.write_table(
        ray.data.from_arrow(t), db, "t", create_from_schema=t.schema,
        conflict_pk="k",
        session=["PRAGMA synchronous=OFF", "PRAGMA cache_size=-2000"],
    )
    assert rep["rows_written"] == 3
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 3
    con.close()
    # a broken session statement fails loudly, not silently
    import pytest as _pytest

    with _pytest.raises(sqlite3.Error):
        rdbms.write_table(ray.data.from_arrow(t), db, "t",
                          session=["PRAGMA ="])
