"""10^10-scale-shaped compaction soak with history retention + vacuum.

Feeds a 50M-event WAL into a history=True delta-sink lake in bounded
epochs through tail_replay(compact_over_bytes=...), vacuuming every
``--vacuum-every`` epochs (retain_last keeps a bounded time-travel
window). Per epoch, prints one JSON line with:

  * events applied, epoch WAL bytes
  * bytes_written (cumulative, from NEW immutable data files — the
    write-amplification numerator; files are never mutated, so summing
    first-sighting sizes is exact)
  * live_bytes (files referenced by current manifests)
  * retained_bytes (everything under the lake root incl. history versions)
  * compactions and vacuum stats

The curves BASELINE.md publishes: write-amp per epoch =
d(bytes_written)/d(wal_bytes); retained_bytes sawtooths with vacuum while
live_bytes stays ~flat — per-epoch cost independent of backlog and table
size, the 10^10-event plan's shape.

Usage: python tools/soak_history.py [--events 50000000] [--feed 8]
       [--vacuum-every 4] [--retain 3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK = "/tmp/dataxray_soak"


def _arg(name: str, default):
    if name in sys.argv:
        return type(default)(sys.argv[sys.argv.index(name) + 1])
    return default


def dir_bytes(root: str) -> int:
    total = 0
    for r, _, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def main() -> None:
    n_events = _arg("--events", 50_000_000)
    feed = _arg("--feed", 8)              # shards per epoch
    vacuum_every = _arg("--vacuum-every", 4)
    retain = _arg("--retain", 3)
    # churn-driven streaming compaction threshold: size to a few epochs of
    # PER-PARTITION delta volume, not to the whole lake
    compact_over = _arg("--compact-over-mb", 8) << 20

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dataxray.gen import GenConfig, write_dataset
    from dataxray.pipelines.replay import ReplayConfig
    from dataxray.pipelines.tail import tail_replay
    from dataxray.state.manifest import Lake

    gen = GenConfig(n_urls=n_events // 10, n_events=n_events,
                    n_shards=128, txn_size=4, zipf_s=1.1, html_mean=96,
                    seed=77)
    data = os.path.join(SOAK, "data")
    write_dataset(data, gen)  # idempotent (gen_meta)

    lake = os.path.join(SOAK, "lake")
    tail_dir = os.path.join(SOAK, "tail")
    shutil.rmtree(lake, ignore_errors=True)
    shutil.rmtree(tail_dir, ignore_errors=True)
    os.makedirs(tail_dir)
    shards = sorted(f for f in os.listdir(os.path.join(data, "events"))
                    if f.endswith(".parquet"))
    cfg = ReplayConfig(num_partitions=128, sink_mode="delta",
                       compact_threshold=10**9,  # byte-driven compaction only
                       history=True)

    seen_files: dict[str, int] = {}
    bytes_written = 0
    wal_bytes = 0
    epoch = 0
    t_start = time.perf_counter()
    for i in range(0, len(shards), feed):
        batch = shards[i:i + feed]
        for f in batch:
            os.link(os.path.join(data, "events", f),
                    os.path.join(tail_dir, f))
            wal_bytes += os.path.getsize(os.path.join(data, "events", f))
        rep = tail_replay(
            tail_dir, lake,
            pages_path=os.path.join(data, "pages.parquet") if i == 0 else None,
            cfg=cfg, max_epochs=1, idle_polls=1, poll_sec=0.0,
            compact_over_bytes=compact_over,
        )
        epoch += 1
        # new immutable data files since last look = this epoch's write I/O
        for r, _, files in os.walk(lake):
            for f in files:
                p = os.path.join(r, f)
                if p not in seen_files and not f.endswith(".json"):
                    try:
                        seen_files[p] = os.path.getsize(p)
                        bytes_written += seen_files[p]
                    except OSError:
                        pass
        lk = Lake(lake)
        live = sum(os.path.getsize(f) for f in lk.all_files()
                   if os.path.exists(f))
        vac = None
        if epoch % vacuum_every == 0:
            vac = lk.vacuum(retain_last=retain)
        print(json.dumps({
            "epoch": epoch,
            "events_applied": rep.events_applied,
            "wal_bytes": wal_bytes,
            "bytes_written": bytes_written,
            "write_amp": round(bytes_written / max(wal_bytes, 1), 3),
            "live_bytes": live,
            "retained_bytes": dir_bytes(lake),
            "compactions": rep.compactions,
            "vacuum": vac,
            "elapsed": round(time.perf_counter() - t_start, 1),
        }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
