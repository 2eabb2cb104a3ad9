"""WAL tail mode: a concurrent producer appends shards while the tailer
polls; the final lake must equal the oracle over everything produced."""

import os
import shutil
import threading
import time

import pyarrow as pa

from dataxray.gen import GenConfig, generate_event_shard, generate_pages, sequential_oracle, write_dataset
from dataxray.pipelines.replay import ReplayConfig
from dataxray.pipelines.tail import tail_replay
from dataxray.state.manifest import Lake

CFG = GenConfig(n_urls=200, n_events=2_000, n_shards=8, html_mean=16)


def test_tail_consumes_live_appends(tmp_path):
    src = str(tmp_path / "gen")
    write_dataset(src, CFG, parallel=False)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    files = sorted(os.listdir(os.path.join(src, "events")))

    # seed the first shard so bootstrap has something to chew on
    shutil.copy(os.path.join(src, "events", files[0]), wal)

    def producer():
        for f in files[1:]:
            time.sleep(0.4)
            tmp = os.path.join(wal, f".{f}")
            shutil.copy(os.path.join(src, "events", f), tmp)
            os.rename(tmp, os.path.join(wal, f))  # atomic publish

    t = threading.Thread(target=producer)
    t.start()
    rep = tail_replay(wal, str(tmp_path / "lake"),
                      pages_path=os.path.join(src, "pages.parquet"),
                      cfg=ReplayConfig(num_partitions=4),
                      poll_sec=0.2, idle_polls=4)
    t.join()
    # a late straggler poll in case the producer outran the last idle window
    rep2 = tail_replay(wal, str(tmp_path / "lake"),
                       cfg=ReplayConfig(num_partitions=4),
                       poll_sec=0.1, idle_polls=1)

    # actually tailed incrementally (count across the straggler poll too —
    # under full-suite load a slow poll can batch several appends)
    assert rep.epochs_applied + rep2.epochs_applied >= 2

    pages = generate_pages(CFG)
    events = pa.concat_tables(
        [generate_event_shard(CFG, s) for s in range(CFG.n_shards)],
        promote_options="permissive")
    oracle = sequential_oracle(pages, events)
    got = Lake(str(tmp_path / "lake")).read_all().to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == oracle["url"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()


def test_tail_streaming_compaction(tmp_path):
    """Delta-mode tail with compact_over_bytes: partitions compact between
    epochs once their delta volume crosses the threshold, lake state stays
    oracle-correct throughout."""
    cfg_gen = GenConfig(n_urls=150, n_events=1_500, n_shards=6, html_mean=16)
    src = str(tmp_path / "gen")
    write_dataset(src, cfg_gen, parallel=False)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    files = sorted(os.listdir(os.path.join(src, "events")))
    # stage all shards up-front; max_epochs=1 per call gives us epoch control
    rep_total = 0
    from dataxray.state.manifest import Lake as L

    for i, f in enumerate(files):
        shutil.copy(os.path.join(src, "events", f), wal)
        rep = tail_replay(wal, str(tmp_path / "lake"),
                          pages_path=os.path.join(src, "pages.parquet") if i == 0 else None,
                          cfg=ReplayConfig(num_partitions=4, sink_mode="delta",
                                           compact_threshold=1000),
                          poll_sec=0.05, idle_polls=1, max_epochs=1,
                          compact_over_bytes=1)  # compact on ANY delta bytes
        rep_total += rep.compactions
    assert rep_total > 0  # streaming compaction actually fired
    lake = L(str(tmp_path / "lake"))
    assert all(lake.manifest(p).get("n_deltas", 0) == 0
               for p in range(4) if lake.manifest(p))

    pages = generate_pages(cfg_gen)
    events = pa.concat_tables(
        [generate_event_shard(cfg_gen, s) for s in range(cfg_gen.n_shards)],
        promote_options="permissive")
    oracle = sequential_oracle(pages, events)
    got = lake.read_all().to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == oracle["url"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()


def test_chunked_replay_keeps_split_txn_in_one_chunk(tmp_path):
    """A transaction whose rows straddle two WAL files must not straddle a
    chunk boundary: chunk i's watermark advance would silently drop the
    txn's later rows in chunk i+1 (the failure mode txn_aligned guards)."""
    import pyarrow.parquet as pq

    from dataxray.pipelines.tail import replay_chunked
    from dataxray.schema import EVENT_SCHEMA

    def ev(url, txn, seq, op, text):
        return {"url": url, "txn_id": txn, "seq": seq, "op": op,
                "warc_ts": 0, "html": b"", "text": text, "lang": "en"}

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    # file A: txns 1..5 (txn 5 split: seq 0 here) — footer hi = 5
    a = pa.Table.from_pylist(
        [ev("https://u1", 1, 0, "I", "v1"), ev("https://u2", 2, 0, "I", "w1"),
         ev("https://u1", 5, 0, "U", "loser")], schema=EVENT_SCHEMA)
    # file B: txn 5 continues (seq 1 WINS) then txn 6 — footer lo = 5
    b = pa.Table.from_pylist(
        [ev("https://u1", 5, 1, "U", "winner"), ev("https://u2", 6, 0, "U", "w2")],
        schema=EVENT_SCHEMA)
    pq.write_table(a, os.path.join(wal, "events-00000.parquet"))
    pq.write_table(b, os.path.join(wal, "events-00001.parquet"))

    # max_chunk_bytes=1 would put each file in its own chunk by size alone;
    # the overlap (5 ∈ both ranges) must force them into ONE chunk
    replay_chunked(wal, str(tmp_path / "lake"),
                   cfg=ReplayConfig(num_partitions=2), max_chunk_bytes=1)
    got = Lake(str(tmp_path / "lake")).read_all().to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got["text"].tolist() == ["winner", "w2"]


def test_chunked_replay_mocks3_source_no_symlinks(tmp_path):
    """Cluster-safety of the 10^10-event path: chunks are passed to replay()
    as real EventFile lists (object-store paths every node can open), never
    a driver-local symlink dir. Evidence: the WAL and the lake both live
    behind mocks3:// (the no-rename object-store backend), the chunked
    replay still matches the sequential oracle, and no dataxray chunk
    staging ever appears under /tmp."""
    import glob as globmod

    from dataxray.pipelines.tail import replay_chunked

    cfg = GenConfig(n_urls=200, n_events=2_000, n_shards=8, html_mean=16)
    src = str(tmp_path / "gen")
    write_dataset(src, cfg, parallel=False)
    lake = "mocks3://" + str(tmp_path / "lake")
    reports = replay_chunked("mocks3://" + os.path.join(src, "events"), lake,
                             pages_path=os.path.join(src, "pages.parquet"),
                             cfg=ReplayConfig(num_partitions=4, sink_mode="delta",
                                              compact_threshold=4),
                             max_chunk_bytes=40_000)  # force several chunks
    assert len(reports) >= 3
    assert not globmod.glob("/tmp/dataxray_chunks/*")  # no driver-local staging

    pages = generate_pages(cfg)
    events = pa.concat_tables(
        [generate_event_shard(cfg, s) for s in range(cfg.n_shards)],
        promote_options="permissive")
    oracle = sequential_oracle(pages, events)
    got = Lake(lake).read_all().to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == oracle["url"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()


def test_chunked_replay_matches_oracle(tmp_path):
    from dataxray.pipelines.tail import replay_chunked

    cfg = GenConfig(n_urls=200, n_events=2_000, n_shards=8, html_mean=16)
    src = str(tmp_path / "gen")
    write_dataset(src, cfg, parallel=False)
    lake = str(tmp_path / "lake")
    reports = replay_chunked(os.path.join(src, "events"), lake,
                             pages_path=os.path.join(src, "pages.parquet"),
                             cfg=ReplayConfig(num_partitions=4, sink_mode="delta",
                                              compact_threshold=4),
                             max_chunk_bytes=40_000)  # force several chunks
    assert len(reports) >= 3

    pages = generate_pages(cfg)
    events = pa.concat_tables(
        [generate_event_shard(cfg, s) for s in range(cfg.n_shards)],
        promote_options="permissive")
    oracle = sequential_oracle(pages, events)
    got = Lake(lake).read_all().to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == oracle["url"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()


def test_tail_maintains_views_per_epoch(tmp_path):
    """maintain_views: a MaterializedGroupStats refreshed by the tailer
    after every epoch ends current with the final lake state."""
    from dataxray.pipelines.derive import MaterializedGroupStats, grouped_count_sum

    src = str(tmp_path / "gen")
    write_dataset(src, CFG, parallel=False)
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    for f in sorted(os.listdir(os.path.join(src, "events"))):
        shutil.copy(os.path.join(src, "events", f), wal)
    lake = str(tmp_path / "lake")
    view = MaterializedGroupStats(Lake(lake), "langs")
    rep = tail_replay(wal, lake,
                      pages_path=os.path.join(src, "pages.parquet"),
                      cfg=ReplayConfig(num_partitions=4, history=True),
                      poll_sec=0.0, idle_polls=1,
                      maintain_views=[view])
    assert rep.epochs_applied >= 1
    got = view.read()
    want = grouped_count_sum(
        Lake(lake).dataset(columns=["lang", "text"])).sort_by("lang")
    assert got.to_pydict() == want.to_pydict()
    assert view.meta()["as_of_txn"] == max(Lake(lake).watermarks().values())


def test_lag_metric_counts_down(tmp_path, ray_session):
    """lag() is metadata-only: full backlog -> partial replay -> caught up."""
    from dataxray.pipelines.tail import lag
    from dataxray.pipelines.replay import replay

    src = str(tmp_path / "gen2")
    write_dataset(src, CFG, parallel=False)
    events_dir = os.path.join(src, "events")
    lake_dir = str(tmp_path / "lake2")

    r0 = lag(events_dir, lake_dir)
    assert r0.applied_txn_low == -1
    assert r0.txn_lag == r0.wal_txn_hi + 1
    assert r0.pending_files == CFG.n_shards
    assert r0.pending_rows_hint > 0

    # bootstrap one bounded chunk only (small byte budget => several chunks)
    from dataxray.sources.wal import scan_event_files
    one = sorted(scan_event_files(events_dir),
                 key=lambda f: (f.txn_lo, f.path))[0]
    replay([one], lake_dir, pages_path=os.path.join(src, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=4))
    r1 = lag(events_dir, lake_dir)
    assert 0 < r1.txn_lag <= r0.wal_txn_hi
    assert r1.pending_files < r0.pending_files
    assert r1.partitions_skewed == 0  # uniform advance within the chunk

    replay(events_dir, lake_dir, cfg=ReplayConfig(num_partitions=4))
    r2 = lag(events_dir, lake_dir)
    assert r2.txn_lag == 0
    assert r2.pending_files == 0 and r2.pending_rows_hint == 0


def test_tail_maintains_join_view_per_epoch(tmp_path):
    """maintain_views duck-types on .refresh(): a MaterializedJoinStats
    (join of the tailed lake with a static co-bucketed lake) refreshed by
    the tailer after every epoch ends current with the final join."""
    from dataxray.pipelines.derive import (MaterializedJoinStats,
                                           joined_group_stats)
    from dataxray.pipelines.replay import replay

    rcfg = ReplayConfig(num_partitions=4, history=True)
    # static side B: fully replayed up front
    src_b = str(tmp_path / "gen-b")
    write_dataset(src_b, GenConfig(n_urls=200, n_events=2_000, n_shards=8,
                                   html_mean=16, seed=9), parallel=False)
    lake_b = str(tmp_path / "lake-b")
    replay(os.path.join(src_b, "events"), lake_b,
           pages_path=os.path.join(src_b, "pages.parquet"), cfg=rcfg)

    # tailed side A
    src = str(tmp_path / "gen-a")
    write_dataset(src, CFG, parallel=False)
    wal = str(tmp_path / "wal-a")
    os.makedirs(wal)
    for f in sorted(os.listdir(os.path.join(src, "events"))):
        shutil.copy(os.path.join(src, "events", f), wal)
    lake_a = str(tmp_path / "lake-a")
    view = MaterializedJoinStats(Lake(lake_a), Lake(lake_b), name="jv")
    rep = tail_replay(wal, lake_a,
                      pages_path=os.path.join(src, "pages.parquet"),
                      cfg=rcfg, poll_sec=0.0, idle_polls=1,
                      maintain_views=[view])
    assert rep.epochs_applied >= 1
    got = view.read()
    want = joined_group_stats(Lake(lake_a), Lake(lake_b))
    assert got.to_pydict() == want.to_pydict()
    assert len(got) > 0
    assert view.meta()["as_of_a"] == max(Lake(lake_a).watermarks().values())
