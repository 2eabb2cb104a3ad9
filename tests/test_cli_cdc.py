"""CLI coverage: lakewriter CDC job, json/orc readers."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from dataxray.cli import run_job
from dataxray.gen import GenConfig, write_dataset
from dataxray.state.manifest import Lake


def test_lakewriter_cdc_job(tmp_path):
    d = str(tmp_path / "data")
    cfg = GenConfig(n_urls=2_000, n_events=1_000, n_shards=2, html_mean=16)
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake")
    job = {"job": {"content": [{
        "reader": {"name": "walreader", "parameter": {"path": os.path.join(d, "events")}},
        "writer": {"name": "lakewriter", "parameter": {
            "path": lake, "pagesPath": os.path.join(d, "pages.parquet"),
            "numPartitions": 4}},
    }]}}
    rep = run_job(job)
    c = rep["content"][0]
    assert c["partitionsCommitted"] == 4 and c["txnHi"] > 0
    t = Lake(lake).read_all()
    assert t.num_rows == c["writeSucceedRecords"]
    # pagesPath in the writer block must actually bootstrap base pages:
    # untouched urls (txn_id == 0) survive only via the pages table
    assert 0 in set(t["txn_id"].to_pylist())
    # rerun: exactly-once no-op
    rep2 = run_job(job)
    assert rep2["content"][0]["partitionsCommitted"] == 0


def test_json_and_orc_readers(tmp_path):
    jpath = str(tmp_path / "in.json")
    with open(jpath, "w") as f:
        for i in range(5):
            f.write(json.dumps({"a": i, "b": f"s{i}"}) + "\n")
    rep = run_job({"job": {"content": [{
        "reader": {"name": "jsonreader", "parameter": {"path": jpath}},
        "writer": {"name": "streamwriter", "parameter": {}},
    }]}})
    assert rep["content"][0]["rows"] == 5

    import pyarrow.orc as orc

    opath = str(tmp_path / "in.orc")
    orc.write_table(pa.table({"x": list(range(7))}), opath)
    rep = run_job({"job": {"content": [{
        "reader": {"name": "orcreader", "parameter": {"path": opath}},
        "writer": {"name": "parquetwriter", "parameter": {
            "path": str(tmp_path / "out"), "writeMode": "truncate"}},
    }]}})
    files = [str(p) for p in (tmp_path / "out").glob("*.parquet")]
    assert sum(pq.read_metadata(f).num_rows for f in files) == 7


def test_lakereader_job_roundtrip(tmp_path):
    """lakereader closes the config loop: CDC-build a lake, then a second
    job reads its resolved snapshot (projection + predicate) through the
    transform chain into parquet."""
    import glob

    import pyarrow.parquet as pq

    d = str(tmp_path / "data2")
    cfg = GenConfig(n_urls=300, n_events=600, n_shards=2, html_mean=16)
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake2")
    run_job({"job": {"content": [{
        "reader": {"name": "walreader", "parameter": {"path": os.path.join(d, "events")}},
        "writer": {"name": "lakewriter", "parameter": {
            "path": lake, "pagesPath": os.path.join(d, "pages.parquet"),
            "numPartitions": 4}},
    }]}})
    out = str(tmp_path / "export")
    rep = run_job({"job": {"content": [{
        "reader": {"name": "lakereader", "parameter": {
            "path": lake, "column": ["url", "txn_id", "lang"],
            "predicate": [["txn_id", ">=", 1]]}},
        "transformer": [{"name": "dx_substr", "parameter": {
            "columnName": "lang", "paras": ["0", "2"]}}],
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": out, "writeMode": "truncate"}},
    }]}})
    import pyarrow.compute as pc

    files = glob.glob(out + "/*.parquet")
    t = pa.concat_tables([pq.read_table(f) for f in files])
    snap = Lake(lake).read_all()
    want = snap.filter(pc.greater_equal(snap["txn_id"], 1))
    assert t.num_rows == want.num_rows
    assert rep["content"][0]["sink"] == out
    assert sorted(t.column_names) == ["lang", "txn_id", "url"]
    assert all(len(x) <= 2 for x in t["lang"].to_pylist() if x is not None)


def test_wal_to_lake_to_rdbms_sync(tmp_path):
    """The reference's flagship scenario composed end-to-end in config
    only: change log -> lake (exactly-once LWW) -> serving RDBMS, then an
    incremental epoch re-syncs via upsert — final sqlite state equals the
    lake snapshot."""
    import sqlite3

    d = str(tmp_path / "data3")
    cfg = GenConfig(n_urls=200, n_events=600, n_shards=4, html_mean=8)
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake3")
    db = str(tmp_path / "serve.db")
    wal_stage = str(tmp_path / "walstage")
    os.makedirs(wal_stage)
    files = sorted(os.listdir(os.path.join(d, "events")))

    import shutil

    def sync(epoch_files):
        for f in epoch_files:
            shutil.copy(os.path.join(d, "events", f), wal_stage)
        run_job({"job": {"content": [{
            "reader": {"name": "walreader", "parameter": {"path": wal_stage}},
            "writer": {"name": "lakewriter", "parameter": {
                "path": lake, "pagesPath": os.path.join(d, "pages.parquet"),
                "numPartitions": 4}},
        }]}})
        run_job({"job": {"content": [{
            "reader": {"name": "lakereader", "parameter": {
                "path": lake, "column": ["url", "txn_id", "lang"]}},
            "writer": {"name": "rdbmswriter", "parameter": {
                "path": db, "table": "pages", "createTable": True,
                "writeMode": "replace",
                # full-snapshot sync must clear rows deleted at the source
                # (replace upserts, never deletes) — preSql @table, the
                # reference's own idiom for that
                "preSql": ["DELETE FROM @table"]}},
        }]}})

    sync(files[:2])
    sync(files[2:])  # incremental epoch: upsert newer rows

    con = sqlite3.connect(db)
    got = dict(con.execute("SELECT url, txn_id FROM pages").fetchall())
    want = {r["url"]: r["txn_id"]
            for r in Lake(lake).read_all().select(["url", "txn_id"]).to_pylist()}
    assert got == want
    con.close()
