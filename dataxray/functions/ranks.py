"""Global ordered row numbers over a distributed sort.

Ray Data's range-partitioned sort orders rows ACROSS blocks but exposes no
global index. This attaches one with metadata only:

  1. ``Dataset.sort`` (the engine's all-to-all range exchange; boundary
     sampling + per-range merge happen inside Ray);
  2. walk the sorted blocks IN ORDER via ``iter_internal_ref_bundles`` and
     prefix-sum their ``num_rows`` — O(#blocks) driver work, no row moves;
  3. one embarrassingly-parallel task per block adds ``offset + arange``.

The sort key must be made unique (append a tie-break column) for the rank
to be deterministic — same requirement the SQL ``row_number() OVER
(ORDER BY ...)`` oracle has.

Scale: the only all-to-all is the sort itself; step 2 is driver metadata
(one int per block); step 3 is map-only. At 100 TB the sort dominates, as
it must — this adds nothing on top.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def with_global_row_numbers(ds, keys: list[str],
                            descending: bool | list[bool] = False,
                            out_col: str = "rank"):
    """Sorted-by-``keys`` Dataset with a 1-based global ``out_col``."""
    import ray
    import ray.data

    sorted_ds = ds.sort(keys, descending=descending)

    @ray.remote(num_cpus=1)
    def add_rank(offset: int, *blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables(blocks, promote_options="permissive")
        return t.append_column(
            out_col, pa.array(offset + 1 + np.arange(len(t), dtype=np.int64)))

    tasks, offset = [], 0
    for bundle in sorted_ds.iter_internal_ref_bundles():
        n = bundle.num_rows()
        if n is None:  # metadata gap: count remotely (rare)
            n = sum(len(b) for b in ray.get(list(bundle.block_refs)))
        if n == 0:
            continue
        tasks.append(add_rank.remote(offset, *bundle.block_refs))
        offset += n
    if not tasks:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(tasks)
