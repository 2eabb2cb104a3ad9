"""Direct hash exchange — a two-phase partition/merge shuffle on raw Ray
tasks, bypassing the generic sort-based groupby.

Why it exists: Ray Data's ``groupby(key)`` is a general sort shuffle —
boundary sampling, per-block sorts, range partitioning. Our merge key is a
*precomputed integer partition id in [0, P)*, so none of that machinery is
needed: map side splits each block by ``_part`` (one key-only sort of int32
codes, then P zero-copy slices), reduce side concatenates its P-th slices
and runs the LWW merge. This is the documented "(c) raw Ray tasks" escape
hatch (driver brief): the partitioning assumption is exactly ``_part =
hash(url) % P`` assigned upstream by AssignPartition.

Phase overlap: split tasks are submitted as map blocks materialize; merge
tasks start as soon as all splits land (the all-to-all barrier is inherent
to any shuffle). Objects flow through the local plasma store (shared
memory) — on a multi-node cluster the same code moves slices over the
network via Ray's object transfer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import PART_COL


def split_by_part(block: pa.Table, num_partitions: int) -> list[pa.Table]:
    """Key-only split: argsort the int32 _part codes, take once, slice P
    contiguous ranges (payload copied once, never sorted per partition)."""
    codes = block[PART_COL].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    sorted_block = block.take(pa.array(order)).drop_columns([PART_COL])
    sorted_codes = codes[order]
    bounds = np.searchsorted(sorted_codes, np.arange(num_partitions + 1))
    return [
        sorted_block.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(num_partitions)
    ]


def direct_exchange(ds, num_partitions: int, merge_fn, merge_kwargs: dict,
                    pipelined: bool = True, fuse_fn=None):
    """Run the partition exchange + per-partition merge with raw Ray tasks.

    ``merge_fn(p, tables, **merge_kwargs)`` runs remotely once per non-empty
    partition and returns a small metadata dict. Returns the list of results.

    pipelined=True streams blocks out of the Dataset executor
    (iter_internal_ref_bundles) and submits split tasks as map output lands,
    overlapping the split phase with the map phase; False materializes first
    (to_arrow_refs) — simpler, but serializes the phases.

    ``fuse_fn`` (optional, picklable block→block callable) runs INSIDE each
    split task before splitting — fusing the last map stage (partition
    assign + combiner) with the split removes one task hop and one plasma
    round-trip per block (the map stage's output block is never written to
    the store as a separate object).
    """
    import ray

    split_remote = ray.remote(num_cpus=1, num_returns=num_partitions)(
        lambda block, n=num_partitions, f=fuse_fn: tuple(
            split_by_part(f(block) if f is not None else block, n))
    )

    def _merge(p, kwargs, *tables):
        parts = [t.drop_columns([PART_COL]) if PART_COL in t.column_names else t
                 for t in tables if t is not None and len(t)]
        if not parts:
            return None
        return merge_fn(p, parts, **kwargs)

    merge_remote = ray.remote(num_cpus=1)(_merge)

    per_part: list[list] = [[] for _ in range(num_partitions)]

    def _submit(block_ref):
        if num_partitions == 1:
            # num_returns=1 would hand the merge a 1-tuple, not a table —
            # with a single partition there is nothing to split anyway
            if fuse_fn is not None:  # callable instance → wrap for @ray.remote
                block_ref = ray.remote(num_cpus=1)(
                    lambda b, f=fuse_fn: f(b)).remote(block_ref)
            per_part[0].append(block_ref)
            return
        for p, r in enumerate(split_remote.remote(block_ref)):
            per_part[p].append(r)

    import os
    import time as _time

    t0 = _time.perf_counter()
    if pipelined:
        keep = []  # hold bundle + block refs so the store can't release them
        for bundle in ds.iter_internal_ref_bundles():
            keep.append(bundle)
            for block_ref in bundle.block_refs:
                keep.append(block_ref)
                _submit(block_ref)
    else:
        for ref in ds.to_arrow_refs():
            _submit(ref)
    t1 = _time.perf_counter()
    metas = ray.get(
        [merge_remote.remote(p, merge_kwargs, *per_part[p]) for p in range(num_partitions)]
    )
    if os.environ.get("DATAXRAY_PRINT_STATS"):
        # map+split drain vs merge tail, for BASELINE.md phase attribution
        import sys as _sys

        print(f"[exchange] map+split drain {t1 - t0:.2f}s, merge tail "
              f"{_time.perf_counter() - t1:.2f}s", file=_sys.stderr)
        try:
            print(ds.stats(), file=_sys.stderr)
        except Exception:
            pass
    return [m for m in metas if m is not None]
