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
    import os as _os

    import ray

    # group G map blocks per split task: the driver's bookkeeping is
    # O(split_tasks × P) ObjectRefs, which scales with DATA (block count)
    # even when per-CPU load is constant — the one coordinator cost that
    # erodes weak scaling. Grouping divides it by G for one extra in-task
    # concat (cheap: the concat is zero-copy chunk stitching).
    group = max(int(_os.environ.get("DATAXRAY_SPLIT_GROUP", "1")), 1)

    def _split_blocks(*blocks, n=num_partitions, f=fuse_fn):
        done = [f(b) if f is not None else b for b in blocks]
        t = done[0] if len(done) == 1 else pa.concat_tables(
            done, promote_options="permissive")
        return tuple(split_by_part(t, n))

    split_remote = ray.remote(num_cpus=1,
                              num_returns=num_partitions)(_split_blocks)

    def _merge(p, kwargs, *tables):
        parts = [t.drop_columns([PART_COL]) if PART_COL in t.column_names else t
                 for t in tables if t is not None and len(t)]
        if not parts:
            return None
        return merge_fn(p, parts, **kwargs)

    merge_remote = ray.remote(num_cpus=1)(_merge)

    per_part: list[list] = [[] for _ in range(num_partitions)]
    pending: list = []

    def _submit(block_refs: list):
        if num_partitions == 1:
            # num_returns=1 would hand the merge a 1-tuple, not a table —
            # with a single partition there is nothing to split anyway
            for block_ref in block_refs:
                if fuse_fn is not None:  # callable inst → wrap for remote
                    block_ref = ray.remote(num_cpus=1)(
                        lambda b, f=fuse_fn: f(b)).remote(block_ref)
                per_part[0].append(block_ref)
            return
        for p, r in enumerate(split_remote.remote(*block_refs)):
            per_part[p].append(r)

    def _enqueue(block_ref):
        pending.append(block_ref)
        if len(pending) >= group:
            _submit(pending[:])
            pending.clear()

    import os
    import time as _time

    t0 = _time.perf_counter()
    if pipelined:
        keep = []  # hold bundle + block refs so the store can't release them
        for bundle in ds.iter_internal_ref_bundles():
            keep.append(bundle)
            for block_ref in bundle.block_refs:
                keep.append(block_ref)
                _enqueue(block_ref)
    else:
        for ref in ds.to_arrow_refs():
            _enqueue(ref)
    if pending:
        _submit(pending[:])
        pending.clear()
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
