"""Tree aggregation on pyarrow group_by kernels — the high-cardinality
aggregate path.

Ray Data's built-in ``groupby().aggregate()`` routes through its generic
shuffle machinery whose per-group overhead dominates when the number of
groups approaches the number of rows (measured: a 95k-group aggregate over
95k partial rows ran at ~8k rows/s — 21 s for a 3 MB input — on both the
sort- and hash-shuffle strategies). The combine itself is what Arrow's C++
hash aggregation does at tens of millions of rows/s, so this module keeps
the *distribution* (per-batch partials in map_batches, then a fan-in tree of
Ray tasks) and hands every actual aggregation to ``pa.TableGroupBy``.

Shape: map_batches(partial TableGroupBy) → tree of merge tasks, each
concatenating ≤ fanin partial blocks and re-aggregating (associative
combines only: sum/min/max/count-as-sum) → one final block. Total moved
bytes ≈ partials × tree depth; no sort, no boundary sampling, no per-group
Python. On a multi-node cluster the merge tasks schedule wherever their
inputs are; the root task sees only pre-combined rows.
"""

from __future__ import annotations

import pyarrow as pa


def _combine_once(keys: list[str], combine: dict[str, str], *tables: pa.Table) -> pa.Table:
    # Ray emits ZERO-COLUMN empty blocks for empty shuffle partitions (e.g.
    # a groupby hash range with no groups), and map_batches passes 0-row
    # blocks through without calling the fn — so alien schema-less blocks
    # reach the merge. Drop any empty block that doesn't carry the key
    # columns; a merge group made ONLY of those combines to a schema-less
    # empty, which the next level (or the final consumer) drops the same way.
    tables = [t for t in tables
              if t.num_rows > 0 or all(k in t.column_names for k in keys)]
    if not tables:
        return pa.table({})
    t = pa.concat_tables(tables, promote_options="permissive")
    if t.num_rows == 0 and not all(k in t.column_names for k in keys):
        return pa.table({})
    agg = pa.TableGroupBy(t, keys).aggregate(list(combine.items()))
    # TableGroupBy names outputs "<col>_<fn>"; fold back to the input names so
    # every tree level sees the same schema
    rename = {f"{c}_{f}": c for c, f in combine.items()}
    return agg.rename_columns([rename.get(n, n) for n in agg.column_names])


def tree_aggregate(ds, keys: list[str], partial, combine: dict[str, str],
                   fanin: int = 8):
    """Distributed aggregate: ``partial`` (a map_batches callable producing
    key cols + value cols) runs per batch, then value cols are re-combined
    up a fan-in tree with the associative fns in ``combine``
    (value_col -> "sum" | "min" | "max"). Returns a Dataset with one block.
    """
    import ray
    import ray.data

    partials = ds.map_batches(partial, batch_format="pyarrow")
    refs = list(partials.to_arrow_refs())
    merge = ray.remote(num_cpus=1)(_combine_once)
    if len(refs) == 1:
        # A single block ref is NOT already combined: a fused read yields
        # one partial per upstream batch (e.g. per parquet row group) and
        # map_batches concatenates them into the one output block. Layout-
        # dependent duplicates unless the combine always runs at least once.
        refs = [merge.remote(keys, combine, refs[0])]
    while len(refs) > 1:
        refs = [merge.remote(keys, combine, *refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    if not refs:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(refs)


def tree_distinct(ds, keys: list[str], combine: dict[str, str] | None = None,
                  fanin: int = 8):
    """Distinct rows over ``keys`` — the replacement for
    ``groupby(keys).map_groups(lambda g: g.slice(0, 1))``, whose per-group
    overhead collapses when group count ≈ row count (the regime this module
    exists for). Optional ``combine`` carries value columns through with an
    associative reducer (e.g. {"hamming": "min"}) so duplicates that differ
    only in a derived metric resolve deterministically.

    Scale note: the tree root holds the full distinct set in one block; for
    results that are themselves huge (≈ corpus-sized), hash-partition first
    and run this per partition instead.
    """
    combine = dict(combine or {})
    cols = keys + [c for c in combine if c not in keys]
    return tree_aggregate(
        ds, keys,
        lambda t: _combine_once(keys, combine, t.select(cols)),
        combine, fanin)
