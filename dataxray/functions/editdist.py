"""Edit-distance-1 similarity self-join (SymSpell / FastSS deletion
neighborhood).

Two strings at Levenshtein distance exactly 1 always share a key in
{s} ∪ del1(s) (delete-one-character variants):

  * substitution at i  → del_i(a) == del_i(b);
  * insertion/deletion → the shorter string IS a delete-1 variant of the
    longer one, and every string is also emitted under itself.

So candidate generation is an equi-join on deletion variants — O(n·L)
keys instead of the O(n²) nested loop — followed by an O(L) two-pointer
verify per candidate. This is the public FastSS/SymSpell scheme
(Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007).

Scale shape (mirrors functions/dedup.py's band pipeline):
  * variants are generated VECTORIZED: one pyarrow utf8_slice + join
    kernel pass per delete position (O(max_len) kernel calls per batch,
    no per-row Python);
  * (variant, name) memberships shuffle once, grouped by a hash bucket
    of the variant (few fat groups, not one group per variant — the
    per-group-overhead regime tree_distinct exists for);
  * inside a bucket, pairs come from runs of equal variants after one
    lexsort; per-pair verify is O(L) and runs only on candidates, whose
    count the deletion join already bounds.

Reference analog: DataX has no similarity join; this extends the dedup
family (SURVEY.md §2.4) the same way ngram_jaccard_pairs does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BUCKETS = 256


def within_one(a: str, b: str) -> bool:
    """Exact check: Levenshtein(a, b) == 1, in O(len) without a DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1 or a == b:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a+1 chars: skip exactly one char of b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _variant_tables(names: pa.ChunkedArray) -> list[pa.Table]:
    """(variant, name) membership rows for name itself + every delete-1
    variant — vectorized per delete position."""
    import polars as pl

    names = names.combine_chunks()
    ln = pc.utf8_length(names)
    max_len = pc.max(ln).as_py() or 0
    outs = [pa.table({"variant": names, "name": names})]
    for j in range(max_len):
        # position j must exist; the EMPTY variant stays (two 1-char
        # strings share only it — its bucket is alphabet-bounded)
        keep = pc.greater(ln, j)
        sub = names.filter(keep)
        if len(sub) == 0:
            continue
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, j),
            pc.utf8_slice_codeunits(sub, j + 1, 1 << 30), "")
        outs.append(pa.table({"variant": var, "name": sub}))
    tagged = []
    for t in outs:
        h = pl.from_arrow(t["variant"]).rename("v").hash(seed=0)
        bkt = (h % _BUCKETS).cast(pl.Int64).to_arrow().cast(pa.int64())
        tagged.append(t.append_column("bkt", bkt))
    return tagged


def lev1_pairs(ds, col: str, a_col: str = "name_a", b_col: str = "name_b"):
    """Dataset of distinct (a_col, b_col) string pairs (a < b) at
    Levenshtein distance exactly 1, over the DISTINCT values of ``col``.

    ``ds`` may contain duplicate values; they are collapsed first (the
    join is over the dictionary, like SymSpell's)."""
    from ..stages.hashagg import tree_distinct

    distinct = tree_distinct(ds.select_columns([col]), [col])

    def explode(t: pa.Table) -> pa.Table:
        parts = _variant_tables(t[col])
        return pa.concat_tables(parts, promote_options="permissive")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        var = g["variant"].combine_chunks().to_numpy(zero_copy_only=False)
        nam = g["name"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((nam, var))
        var, nam = var[order], nam[order]
        starts = np.flatnonzero(
            np.concatenate(([True], var[1:] != var[:-1])))
        ends = np.concatenate((starts[1:], [len(var)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = nam[s:e]
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    if run[i] != run[j] and within_one(run[i], run[j]):
                        lo, hi = sorted((run[i], run[j]))
                        a_out.append(lo)
                        b_out.append(hi)
        return pa.table({a_col: pa.array(a_out, pa.string()),
                         b_col: pa.array(b_out, pa.string())})

    memberships = distinct.map_batches(explode, batch_format="pyarrow")
    pairs = memberships.groupby("bkt").map_groups(
        bucket_pairs, batch_format="pyarrow")
    return tree_distinct(pairs, [a_col, b_col])
