"""Delta-mode lake: per-epoch append commits with LWW-on-read resolution and
auto-compaction (the merge-amplification fix for steady-state epochs)."""

import os
import shutil

import pyarrow as pa
import pytest

from dataxray.gen import GenConfig, generate_event_shard, generate_pages, sequential_oracle, write_dataset
from dataxray.pipelines.replay import ReplayConfig, replay
from dataxray.state.manifest import Lake

CFG = GenConfig(n_urls=250, n_events=4_000, n_shards=8, html_mean=32, zipf_s=1.2)

# every test runs on the rename backend ("") AND the no-rename object-store
# backend ("mocks3://" -> lakefs.ObjectLakeFS: put/copy/delete only)
pytestmark = pytest.mark.parametrize("scheme", ["", "mocks3://"])


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("deltadata"))
    write_dataset(d, CFG, parallel=False)
    return d


@pytest.fixture(scope="module")
def oracle_df():
    pages = generate_pages(CFG)
    events = pa.concat_tables(
        [generate_event_shard(CFG, s) for s in range(CFG.n_shards)],
        promote_options="permissive")
    return sequential_oracle(pages, events)


def _epoch_replay(data_dir, lake, cfg, tmp_path, n_epochs=8):
    files = sorted(os.listdir(os.path.join(data_dir, "events")))
    staged = str(tmp_path / "stagedwal")
    os.makedirs(staged, exist_ok=True)
    for f in files:
        shutil.copy(os.path.join(data_dir, "events", f), staged)
        replay(staged, lake,
               pages_path=os.path.join(data_dir, "pages.parquet"), cfg=cfg)


def assert_oracle(lake_dir, oracle_df):
    got = Lake(lake_dir).read_all().to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == list(oracle_df.columns)
    assert got["url"].tolist() == oracle_df["url"].tolist()
    assert got["text"].tolist() == oracle_df["text"].tolist()
    assert got["txn_id"].tolist() == oracle_df["txn_id"].tolist()


def test_delta_epochs_match_oracle(data_dir, oracle_df, tmp_path, scheme):
    lake = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    _epoch_replay(data_dir, lake, cfg, tmp_path)
    # deltas actually accumulated (no compaction at threshold 100)
    n_deltas = [Lake(lake).manifest(p).get("n_deltas", 0) for p in range(4)]
    assert max(n_deltas) >= 3
    assert_oracle(lake, oracle_df)


def test_delta_with_compaction_matches_oracle(data_dir, oracle_df, tmp_path, scheme):
    lake = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=3)
    _epoch_replay(data_dir, lake, cfg, tmp_path)
    assert_oracle(lake, oracle_df)
    # compaction kept the file count bounded
    assert all(Lake(lake).num_files(p) <= 3 for p in range(4))


def test_delta_writes_less_than_rewrite(data_dir, tmp_path, scheme):
    """The point of deltas: an epoch writes O(epoch), not O(partition)."""
    lake_d = scheme + str(tmp_path / "ld")
    lake_r = scheme + str(tmp_path / "lr")
    cfg_d = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    cfg_r = ReplayConfig(num_partitions=4)
    _epoch_replay(data_dir, lake_d, cfg_d, tmp_path / "a")
    _epoch_replay(data_dir, lake_r, cfg_r, tmp_path / "b")
    import json, glob

    def last_commit_rows(lake):
        from dataxray.state import lakefs

        base = lakefs.resolve(lake)[1]  # mocks3 bytes live on local disk
        runs = sorted(glob.glob(os.path.join(base, "_runs", "*.json")),
                      key=os.path.getmtime)
        with open(runs[-1]) as f:
            return json.load(f)["write_succeed_records"]

    assert last_commit_rows(lake_d) < last_commit_rows(lake_r)


def test_dataset_read_resolves_deltas(data_dir, oracle_df, tmp_path, scheme):
    lake = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    _epoch_replay(data_dir, lake, cfg, tmp_path)
    ds = Lake(lake).dataset()
    rows = ds.take_all()
    assert len(rows) == len(oracle_df)
    got = sorted(r["url"] for r in rows)
    assert got == oracle_df["url"].tolist()


def test_dataset_column_pruning_spans_delta_and_base(data_dir, oracle_df,
                                                     tmp_path, scheme):
    """columns= prunes on both the base read and the delta-resolution path."""
    lake = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    _epoch_replay(data_dir, lake, cfg, tmp_path)
    ds = Lake(lake).dataset(columns=["url", "txn_id"])
    rows = ds.take_all()
    assert len(rows) == len(oracle_df)
    assert set(rows[0].keys()) == {"url", "txn_id"}
    assert sorted(r["url"] for r in rows) == oracle_df["url"].tolist()


def test_compaction_scheduling_by_delta_bytes(data_dir, tmp_path, scheme):
    """min_delta_bytes gates compaction on accumulated delta volume."""
    lake_dir = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    _epoch_replay(data_dir, lake_dir, cfg, tmp_path)
    lake = Lake(lake_dir)
    assert any(lake.delta_bytes(p) > 0 for p in range(4))
    # impossible threshold → nothing compacts
    assert lake.compact_all(min_delta_bytes=1 << 40) == 0
    assert all(lake.manifest(p).get("n_deltas", 0) > 0 for p in range(4))
    # 1-byte threshold → everything with deltas compacts
    assert lake.compact_all(min_delta_bytes=1) == 4
    assert all(lake.delta_bytes(p) == 0 for p in range(4))


def test_explicit_compaction(data_dir, oracle_df, tmp_path, scheme):
    """Lake.compact_all resolves deltas into single bases at unchanged
    watermarks; state and subsequent replays are unaffected."""
    lake_dir = scheme + str(tmp_path / "lake")
    cfg = ReplayConfig(num_partitions=4, sink_mode="delta", compact_threshold=100)
    _epoch_replay(data_dir, lake_dir, cfg, tmp_path)
    lake = Lake(lake_dir)
    assert any(lake.manifest(p).get("n_deltas", 0) > 0 for p in range(4))
    wm_before = lake.watermarks()
    n = lake.compact_all()
    assert n > 0
    assert lake.watermarks() == wm_before  # compaction never moves watermarks
    assert all(lake.manifest(p).get("n_deltas", 0) == 0 for p in range(4))
    assert all(len(lake.manifest(p)["files"]) == 1 for p in range(4))
    assert_oracle(lake_dir, oracle_df)
    # second compaction: no-op
    assert lake.compact_all() == 0
    # evolution survived the delta/compact cycle byte-for-byte
    got = lake.read_all().to_pandas().sort_values("url").reset_index(drop=True)
    ch = got["content_hash"].where(got["content_hash"].notna(), None).tolist()
    assert ch == oracle_df["content_hash"].tolist()
