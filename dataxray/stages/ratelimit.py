"""Sleep-based records/s + bytes/s throttle stage (flow control per
Channel.java:148-204). The global cap is approximated as cap/concurrency per
concurrent task, like DataX's per-channel caps; used by both the CLI job
runner (job.setting.speed) and the replay pipeline (ReplayConfig caps) to
protect a shared WAL store or destination from a full-speed backfill."""

from __future__ import annotations

import time

import pyarrow as pa


class RateLimiter:
    def __init__(self, records_per_s: float | None, bytes_per_s: float | None):
        self.rps = records_per_s
        self.bps = bytes_per_s
        self.start = None
        self.rows = 0
        self.nbytes = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        now = time.monotonic()
        if self.start is None:
            self.start = now
        self.rows += len(batch)
        self.nbytes += batch.nbytes
        waits = []
        if self.rps:
            waits.append(self.rows / self.rps - (now - self.start))
        if self.bps:
            waits.append(self.nbytes / self.bps - (now - self.start))
        wait = max(waits, default=0.0)
        if wait > 0:
            time.sleep(min(wait, 5.0))
        return batch
