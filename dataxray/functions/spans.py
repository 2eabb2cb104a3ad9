"""Cross-document duplicated-span detection (exact substring-level dedup
signal).

For each document: how many of its distinct k-token spans also occur in at
least one OTHER document. This is the per-document coverage statistic behind
substring-level training-data dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022 — there at 50-token granularity
over a suffix array; here at k-token shingle granularity, which is the
map-reduce-friendly exact formulation).

Pipeline shape:
  1. span extraction is FULLY VECTORIZED: whitespace-regex tokenize →
     list_flatten + parent indices → k shifted slices of the flat token
     array joined element-wise (O(k) kernel calls per batch, no per-row
     Python); per-document distinctness falls out of a C-speed in-batch
     TableGroupBy because each document is row-contained;
  2. span doc-frequencies via the tree aggregate (shuffle carries one row
     per distinct span per block);
  3. the duplicated-span set (df >= 2) is broadcast once (ray.put) and
     probed with pc.is_in — its size is bounded by the ACTUAL cross-doc
     duplication, not the corpus. For corpora where even that set is huge,
     the documented alternative is hash-partitioning memberships by span
     and emitting per-doc increments from >=2-doc groups (one extra
     shuffle, no broadcast).

The membership table is materialized between passes 2 and 3 so span
extraction runs once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def span_memberships(batch: pa.Table, k: int, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Distinct (doc_id, span) rows for every k-token span in the batch."""
    toks = pc.split_pattern_regex(batch[text_col].combine_chunks(), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    par = parents.filter(keep).to_numpy(zero_copy_only=False)
    n = len(flat)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "span": pa.array([], pa.string())})
    if n < k:
        return empty
    m = n - k + 1
    valid = par[:m] == par[k - 1:]
    if not valid.any():
        return empty
    shifted = [flat.slice(j, m) for j in range(k)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    vmask = pa.array(valid)
    grams = grams.filter(vmask)
    doc = batch[id_col].combine_chunks().cast(pa.int64()).take(
        pa.array(par[:m][valid]))
    tb = pa.table({id_col: doc, "span": grams})
    # in-batch distinct == per-document distinct (documents are row-contained)
    return pa.TableGroupBy(tb, [id_col, "span"]).aggregate([])


def duplicated_span_stats(ds, k: int = 5, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Dataset of (doc_id, n_spans, n_dup_spans): distinct k-token spans
    per document, and how many of them occur in >= 2 documents."""
    import ray

    from ..stages.hashagg import tree_aggregate

    mem = ds.map_batches(
        lambda t: span_memberships(t, k, id_col, text_col),
        batch_format="pyarrow").materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"span": t["span"],
                       "nd": pa.array(np.ones(len(t), dtype=np.int64))})
        return pa.TableGroupBy(tb, ["span"]).aggregate([("nd", "sum")])

    counts = tree_aggregate(mem, ["span"], df_partial, {"nd_sum": "sum"})
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["nd_sum"], 2)).select(["span"]),
        batch_format="pyarrow")
    dup_tbl = pa.concat_tables(ray.get(dup.to_arrow_refs()),
                               promote_options="permissive")
    dup_ref = ray.put(dup_tbl["span"].combine_chunks())

    def stat_partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        is_dup = pc.cast(pc.is_in(t["span"], value_set=_ray.get(dup_ref)),
                         pa.int64())
        tb = pa.table({id_col: t[id_col],
                       "n_spans": pa.array(np.ones(len(t), dtype=np.int64)),
                       "n_dup_spans": is_dup})
        return pa.TableGroupBy(tb, [id_col]).aggregate(
            [("n_spans", "sum"), ("n_dup_spans", "sum")])

    out = tree_aggregate(mem, [id_col], stat_partial,
                         {"n_spans_sum": "sum", "n_dup_spans_sum": "sum"})
    return out.map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            "n_spans": pc.cast(t["n_spans_sum"], pa.int64()),
            "n_dup_spans": pc.cast(t["n_dup_spans_sum"], pa.int64()),
        }),
        batch_format="pyarrow")
