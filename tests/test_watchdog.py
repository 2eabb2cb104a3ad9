"""Stall watchdog: a wedged per-partition merge must be detected and
surfaced in the RunReport while the job still completes (TaskMonitor /
OTSStreamReaderSlaveProxy per-shard timeout analog)."""

import os
import time

from dataxray.gen import GenConfig, write_dataset
from dataxray.pipelines.replay import ReplayConfig, replay
from dataxray.state.manifest import Lake


def test_wedged_merge_is_detected(tmp_path, monkeypatch):
    d = str(tmp_path / "data")
    write_dataset(d, GenConfig(n_urls=100, n_events=1_000, n_shards=2,
                               html_mean=16), parallel=False)

    import dataxray.pipelines.replay as R

    real_mt = R._merge_tables

    def wedged_merge_tables(p, tables, **kw):
        if p == 0 and kw.get("monitor") is not None:
            kw["monitor"].beat.remote(p, "start")
            time.sleep(2.5)  # wedged AFTER starting, past the 0.5s timeout
        return real_mt(p, tables, **kw)

    # merge_and_stage closes over the module global; cloudpickle ships the
    # patched value to the workers because the closure is pickled by value
    monkeypatch.setattr(R, "_merge_tables", wedged_merge_tables)

    rep = replay(os.path.join(d, "events"), str(tmp_path / "lake"),
                 pages_path=os.path.join(d, "pages.parquet"),
                 cfg=ReplayConfig(num_partitions=2, stall_timeout_sec=0.5))
    assert 0 in rep.stalled_partitions
    # detection, not destruction: the job still finished and committed
    assert rep.partitions_committed == 2
    assert len(Lake(str(tmp_path / "lake")).watermarks()) == 2


def test_no_stalls_on_healthy_run(tmp_path):
    d = str(tmp_path / "data")
    write_dataset(d, GenConfig(n_urls=100, n_events=1_000, n_shards=2,
                               html_mean=16), parallel=False)
    rep = replay(os.path.join(d, "events"), str(tmp_path / "lake"),
                 pages_path=os.path.join(d, "pages.parquet"),
                 cfg=ReplayConfig(num_partitions=4, stall_timeout_sec=30.0))
    assert rep.stalled_partitions == []
    assert rep.partitions_committed == 4
