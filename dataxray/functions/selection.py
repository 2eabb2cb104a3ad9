"""Exact distributed order statistics by iterative histogram refinement —
global quantiles WITHOUT a global sort.

Classic distributed selection (the Blum/median-of-medians idea adapted to
streaming passes): keep a candidate range [lo, hi] known to contain the
wanted order statistics, and each pass

  1. histogram the column into B equal sub-ranges of [lo, hi] — one
     map_batches producing a B-int vector per batch, tree-summed
     (np.bincount per batch; the "shuffle" is B integers per block);
  2. locate the bucket(s) holding the wanted ranks from the cumulative
     histogram, shrink [lo, hi] to them, and carry the rank offset.

Each pass shrinks the range by ~B×, so passes = ceil(log_B(range)) — 2-3
streaming scans for any realistic fixed-point domain. When the surviving
range holds few enough rows, one final filtered collect sorts just those.
No all-to-all, no per-node memory beyond a B-int vector: the shape that
still works when the column is 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _range_histogram(ds, col: str, lo: int, hi: int, b: int) -> np.ndarray:
    """Tree-summed histogram of values in [lo, hi] over b equal buckets."""
    import ray

    width = hi - lo + 1

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        v = v[(v >= lo) & (v <= hi)]
        idx = ((v.astype(np.int64) - lo) * b) // width
        h = np.bincount(idx, minlength=b).astype(np.int64)
        return pa.table({"h": pa.array([h.tolist()],
                                       pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    acc = np.zeros(b, dtype=np.int64)
    for tbl in ray.get(list(parts.to_arrow_refs())):
        for row in tbl["h"].to_pylist():
            acc += np.asarray(row, dtype=np.int64)
    return acc


def exact_order_stats(ds, col: str, ks: list[int],
                      num_buckets: int = 1024,
                      collect_limit: int = 2_000_000) -> dict[int, int]:
    """Exact values of the 0-based order statistics ``ks`` of int column
    ``col``. ``ds`` is re-scanned once per refinement pass (keep it a cheap
    projection; callers at scale pass a column-pruned read)."""
    import ray

    # bounds + count in one streamed pass
    def mm_partial(t: pa.Table) -> pa.Table:
        v = t[col]
        return pa.table({"mn": pa.array([pc.min(v).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(v).as_py()], pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    mm = pa.concat_tables(
        ray.get(ds.map_batches(mm_partial, batch_format="pyarrow")
                .to_arrow_refs()), promote_options="permissive")
    lo = pc.min(mm["mn"]).as_py()
    hi = pc.max(mm["mx"]).as_py()
    n = int(pc.sum(mm["n"]).as_py() or 0)
    if n == 0:
        raise ValueError("exact_order_stats on an empty column")
    for k in ks:
        if not 0 <= k < n:
            raise ValueError(f"order statistic {k} out of range 0..{n-1}")

    def collect_range(c_lo: int, c_hi: int) -> np.ndarray:
        def collect(t: pa.Table) -> pa.Table:
            v = t[col]
            mask = pc.and_(pc.greater_equal(v, c_lo),
                           pc.less_equal(v, c_hi))
            return t.filter(mask).select([col])

        parts = [tbl[col].combine_chunks().to_numpy(zero_copy_only=False)
                 for tbl in ray.get(
                     ds.map_batches(collect, batch_format="pyarrow")
                     .to_arrow_refs())]
        return np.sort(np.concatenate(
            parts or [np.array([], dtype=np.int64)]))

    # worklist of (lo, hi, base, in_range, ks) groups; ranks that land in
    # the same bucket refine together, ranks in different buckets split
    # into independent (strictly narrower) groups — so far-apart ranks
    # (e.g. min and max) can never pin the range open
    result: dict[int, int] = {}
    pending = [(lo, hi, 0, n, sorted(ks))]
    while pending:
        g_lo, g_hi, base, in_range, g_ks = pending.pop()
        if g_lo == g_hi:
            for k in g_ks:
                result[k] = g_lo
            continue
        if in_range <= collect_limit:
            vals = collect_range(g_lo, g_hi)
            for k in g_ks:
                result[k] = int(vals[k - base])
            continue
        width = g_hi - g_lo + 1
        b = int(min(num_buckets, width))
        # (v-lo)*b must stay in int64; shrink b if the range is astronomical
        while width > (1 << 62) // b:
            b //= 2
        hist = _range_histogram(ds, col, g_lo, g_hi, b)
        cum = np.cumsum(hist)
        by_bucket: dict[int, list[int]] = {}
        for k in g_ks:
            by_bucket.setdefault(
                int(np.searchsorted(cum, k - base, side="right")), []
            ).append(k)
        for bkt, bkt_ks in by_bucket.items():
            sub_lo = g_lo + (bkt * width) // b
            sub_hi = min(g_lo + ((bkt + 1) * width) // b - 1, g_hi)
            sub_base = base + (int(cum[bkt - 1]) if bkt > 0 else 0)
            pending.append((sub_lo, sub_hi, sub_base, int(hist[bkt]),
                            bkt_ks))
    return result
