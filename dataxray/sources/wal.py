"""WAL-tail / change-log source: pruned, schema-unified Parquet event reads.

The analog of otsstreamreader's bounded change-stream export (SURVEY.md §3.3):
shards ≙ event-log Parquet files covering contiguous txn ranges; the
checkpoint table ≙ lake manifests; resume ≙ skipping files whose whole txn
range is at/below the global low watermark, then filtering the remainder
per-partition inside the merge (exact watermark, ShardCheckpoint skipCount
analog).

Pruning uses Parquet *footer statistics* on ``txn_id`` (no filename
convention, no data read). Schema unification handles additive evolution:
files written before the evolution txn lack the new column; we read every
file against the unified schema so old files yield nulls for it
(pa.unify_schemas — the Ray-native replacement for DataX's schemaless
Records).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import unify


@dataclass(frozen=True)
class EventFile:
    path: str
    txn_lo: int
    txn_hi: int
    num_rows: int


def scan_event_files(events_dir: str) -> list[EventFile]:
    """Footer-only scan: (txn_lo, txn_hi, rows) per file from row-group stats."""
    out = []
    for path in sorted(glob.glob(os.path.join(events_dir, "*.parquet"))):
        md = pq.read_metadata(path)
        idx = md.schema.to_arrow_schema().get_field_index("txn_id")
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out.append(EventFile(path, lo if lo is not None else 0, hi if hi is not None else 2**62, md.num_rows))
    return out


def prune_files(files: list[EventFile], low_watermark: int) -> list[EventFile]:
    """Keep files containing any txn > low_watermark."""
    return [f for f in files if f.txn_hi > low_watermark]


def txn_aligned(files: list[EventFile]) -> bool:
    """True when file txn ranges are disjoint — i.e. no transaction is split
    across files. A split txn breaks watermark semantics (a watermark at that
    txn would drop the later half); real WAL segmenters rotate at commit
    boundaries. Misaligned (or corrupt-stat: dirty rows can skew footer
    min/max) file sets disable the uniform-watermark fast path rather than
    failing the job."""
    ordered = sorted(files, key=lambda f: (f.txn_lo, f.path))
    return all(b.txn_lo > a.txn_hi for a, b in zip(ordered, ordered[1:]))


def unified_schema(files: list[EventFile]) -> pa.Schema:
    return unify([pq.read_schema(f.path) for f in files])


def read_events(
    events_dir: str,
    low_watermark: int = 0,
    columns: list[str] | None = None,
    **read_kwargs,
):
    """ray.data.Dataset of events with txn > low_watermark (file-granular
    pruning here; exact per-partition filtering happens in the merge).
    Returns (dataset, unified_event_schema, total_rows_hint, txn_hi) where
    txn_hi is the max transaction covered by the files read — after a
    successful replay EVERY partition's watermark may advance to it, even
    partitions that saw no rows (they provably have no events ≤ txn_hi).
    """
    import ray.data

    files = prune_files(scan_event_files(events_dir), low_watermark)
    if not files:
        return None, None, 0, low_watermark
    schema = unified_schema(files)
    ds = ray.data.read_parquet(
        [f.path for f in files], schema=schema, columns=columns, **read_kwargs
    )
    if txn_aligned(files):
        txn_hi = max(f.txn_hi for f in files)
    else:  # conservative: no uniform watermark advance on misaligned logs
        import warnings

        warnings.warn(
            "WAL files overlap or split transactions (or dirty rows skew "
            "footer stats); uniform watermark advance disabled for this run",
            stacklevel=2,
        )
        txn_hi = low_watermark
    return ds, schema, sum(f.num_rows for f in files), txn_hi
