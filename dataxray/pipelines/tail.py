"""Continuous WAL tailing: poll the event-log directory and replay each new
epoch as it lands — the literal binlog/WAL-tail mode (otsstreamreader's
bounded time-window export, looped: each poll is one bounded replay with
resumable per-partition watermarks; between polls the lake is a consistent
committed snapshot).

Termination: after ``idle_polls`` consecutive polls with no new events
(bounded-tail semantics for batch jobs / tests), or ``max_epochs`` applied
epochs, whichever first. A long-lived service passes float('inf')/None.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..state.checkpoint import RunReport
from .replay import ReplayConfig, replay


@dataclass
class TailReport:
    epochs_applied: int = 0
    events_applied: int = 0
    polls: int = 0
    runs: list = field(default_factory=list)


def tail_replay(
    events_dir: str,
    lake_dir: str,
    pages_path: str | None = None,
    cfg: ReplayConfig = ReplayConfig(),
    poll_sec: float = 0.5,
    idle_polls: int = 3,
    max_epochs: int | None = None,
) -> TailReport:
    """Tail ``events_dir`` until idle. Every poll that finds unapplied txns
    runs one exactly-once replay epoch; crashes mid-tail resume exactly like
    any replay (manifest watermarks)."""
    report = TailReport()
    idle = 0
    first = True
    while idle < idle_polls:
        if max_epochs is not None and report.epochs_applied >= max_epochs:
            break
        rep: RunReport = replay(
            events_dir, lake_dir,
            pages_path=pages_path if first else None,
            cfg=cfg,
        )
        first = False
        report.polls += 1
        if rep.partitions_committed > 0:
            report.epochs_applied += 1
            report.events_applied += rep.read_succeed_records
            report.runs.append(rep.run_id)
            idle = 0
        else:
            idle += 1
            if idle < idle_polls:
                time.sleep(poll_sec)
    return report
