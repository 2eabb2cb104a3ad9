"""Dirty-record side channel + error budget.

Reference semantics (ErrorRecordChecker.java:18-84, invoked from
JobContainer.java:868-872 and periodically in AbstractTaskGroupScheduler.java:84;
dirty-record contract dataxPluginDev.md:426-440):

  * every malformed record is captured on a side channel, never silently lost;
  * the job fails when dirty count > ``record`` (absolute) or dirty fraction >
    ``percentage``; the absolute record limit takes priority.

Ray-native shape: validation stages write dirty rows to per-task Parquet files
under ``dirty_dir`` (no shared actor, no driver round-trip in the hot path);
the budget is enforced by reading only the Parquet *footers* (row counts) —
cheap at any scale.
"""

from __future__ import annotations

import glob
import os
import uuid
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq


class ErrorBudgetExceeded(RuntimeError):
    pass


@dataclass(frozen=True)
class ErrorLimit:
    """job.setting.errorLimit analog. None = unlimited."""

    record: int | None = None
    percentage: float | None = None


def write_dirty(dirty_dir: str, table: pa.Table, reason_col: str | None = None) -> int:
    """Append a batch of dirty rows as a uniquely-named Parquet file.

    Called from inside map_batches tasks; unique names make task retries safe
    (duplicate dirty files only over-count, never corrupt — same stance as the
    reference's at-least-once dirty collection, StdoutPluginCollector).
    """
    if len(table) == 0:
        return 0
    os.makedirs(dirty_dir, exist_ok=True)
    path = os.path.join(dirty_dir, f"dirty-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, path)
    return len(table)


def dirty_count(dirty_dir: str) -> int:
    """Total dirty rows — footer metadata only, no data read."""
    total = 0
    for p in glob.glob(os.path.join(dirty_dir, "*.parquet")):
        total += pq.read_metadata(p).num_rows
    return total


def check_budget(dirty_dir: str, total_records: int, limit: ErrorLimit) -> int:
    """Raise ErrorBudgetExceeded per the reference's priority rules; return
    the dirty count otherwise."""
    n_dirty = dirty_count(dirty_dir) if os.path.isdir(dirty_dir) else 0
    if limit.record is not None and n_dirty > limit.record:
        raise ErrorBudgetExceeded(
            f"dirty records {n_dirty} > errorLimit.record {limit.record}"
        )
    if limit.percentage is not None and total_records > 0:
        frac = n_dirty / total_records
        if frac > limit.percentage:
            raise ErrorBudgetExceeded(
                f"dirty fraction {frac:.4f} > errorLimit.percentage {limit.percentage}"
            )
    return n_dirty
