"""WAL source pruning, checkpoint watermarks, schema unification, hashing
stability (the resume-critical plumbing)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataxray.hashing import hash_strings_u64, partition_of, partitioner_id
from dataxray.schema import EVENT_SCHEMA, align_table, unify
from dataxray.sources import wal
from dataxray.state.checkpoint import global_low_watermark
from dataxray.state.manifest import Lake


def _write_events(path, txns):
    t = pa.table({
        "url": [f"u{i}" for i in range(len(txns))],
        "txn_id": pa.array(txns, pa.int64()),
        "seq": pa.array([0] * len(txns), pa.int64()),
        "op": ["U"] * len(txns),
    })
    pq.write_table(t, path)


def test_footer_stats_pruning(tmp_path):
    d = str(tmp_path)
    _write_events(os.path.join(d, "a.parquet"), [1, 2, 3])
    _write_events(os.path.join(d, "b.parquet"), [4, 5, 6])
    _write_events(os.path.join(d, "c.parquet"), [7, 8])
    files = wal.scan_event_files(d)
    assert [(f.txn_lo, f.txn_hi) for f in files] == [(1, 3), (4, 6), (7, 8)]
    assert [os.path.basename(f.path) for f in wal.prune_files(files, 6)] == ["c.parquet"]
    assert wal.prune_files(files, 8) == []
    # boundary: watermark inside a file keeps that file
    assert len(wal.prune_files(files, 5)) == 2


def test_global_low_watermark_requires_all_partitions():
    assert global_low_watermark({0: 10, 1: 20}, num_partitions=4) == 0
    assert global_low_watermark({0: 10, 1: 20, 2: 15, 3: 30}, num_partitions=4) == 10


def test_unify_canonical_order_and_promotion():
    evolved = unify([EVENT_SCHEMA, pa.schema([("content_hash", pa.string())])])
    assert evolved.names[:4] == ["url", "txn_id", "seq", "op"]
    assert "content_hash" in evolved.names
    # align fills missing with nulls and is a no-op on matching schemas
    t = pa.Table.from_pylist([{"url": "a", "txn_id": 1, "seq": 0, "op": "U"}])
    a = align_table(t, evolved)
    assert a["content_hash"].null_count == 1
    assert align_table(a, evolved) is a  # fast path: same schema object returned


def test_hash_stability_and_spread():
    arr = pa.array([f"https://host{i}.example/p/{i}" for i in range(10_000)])
    h1, h2 = hash_strings_u64(arr), hash_strings_u64(arr)
    assert np.array_equal(h1, h2)
    parts = partition_of(arr, 64)
    counts = np.bincount(parts, minlength=64)
    assert counts.min() > 0.5 * counts.mean()  # no empty/pathological buckets
    assert partitioner_id().startswith(("polars", "crc32"))


def test_partitioner_mismatch_refused(tmp_path):
    lake = Lake(str(tmp_path / "l"))
    lake.init(4, EVENT_SCHEMA)
    meta = lake.meta()
    meta["partitioner"] = "something-else"
    import json

    with open(os.path.join(lake.root, "_meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        lake.validate_partitioner()


def test_outlier_txn_does_not_poison_watermarks(tmp_path):
    """A corrupt huge txn_id in a dirty row must not advance watermarks past
    the max VALID applied txn (review fix: watermark poisoning)."""
    import pyarrow.compute as pc

    from dataxray.pipelines.replay import ReplayConfig, replay

    d = str(tmp_path / "wal")
    os.makedirs(d)
    t1 = pa.table({"url": ["a", "b"], "txn_id": pa.array([1, 2], pa.int64()),
                   "seq": [0, 0], "op": ["I", "I"],
                   "text": ["x", "y"]})
    # second file: one valid event txn 3 plus a corrupt row with txn 10^9
    # and a bad op (dirty -> never applied)
    t2 = pa.table({"url": ["c", "zz"], "txn_id": pa.array([3, 10**9], pa.int64()),
                   "seq": [0, 0], "op": ["I", "X"],
                   "text": ["z", "junk"]})
    pq.write_table(t1, os.path.join(d, "events-00000.parquet"))
    pq.write_table(t2, os.path.join(d, "events-00001.parquet"))
    lake_dir = str(tmp_path / "lake")
    replay(d, lake_dir, cfg=ReplayConfig(num_partitions=2,
                                         dirty_dir=str(tmp_path / "dirty")))
    wm = Lake(lake_dir).watermarks()
    assert max(wm.values()) <= 3  # not poisoned to 10^9
    # a later legitimate event must still apply
    t3 = pa.table({"url": ["d"], "txn_id": pa.array([4], pa.int64()),
                   "seq": [0], "op": ["I"], "text": ["late"]})
    pq.write_table(t3, os.path.join(d, "events-00002.parquet"))
    replay(d, lake_dir, cfg=ReplayConfig(num_partitions=2,
                                         dirty_dir=str(tmp_path / "dirty")))
    urls = set(Lake(lake_dir).read_all()["url"].to_pylist())
    assert "d" in urls
