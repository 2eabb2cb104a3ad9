"""Distributed connected components — dup-pair clustering.

Dedup stages (MinHash/LSH, n-gram Jaccard, SimHash, embedding cosine) emit
PAIRS; choosing one representative per duplicate *cluster* needs the
transitive closure. This is iterative min-label propagation expressed in
Ray Data ops (the MapReduce-CC family, Kiveris et al., "Connected
components in MapReduce and beyond", SoCC'14 — the simple label-prop
variant, adequate because near-dup clusters have tiny diameters):

    labels <- node id
    repeat: every node sends its label to its neighbors;
            label(node) <- min(own, received); stop when no label moved.

Scale shape per iteration:
  * message generation is a HASH-BUCKET cogroup (labels ∪ adjacency
    grouped by splitmix64(node) % num_buckets), with a vectorized
    searchsorted merge inside each bucket — O(parallelism) Python calls
    per round, NOT one per node;
  * the label update is the native Arrow groupby-min (C speed).
All-to-all volume is O(|E|) per round; rounds = O(cluster diameter)
(2-4 for dup clusters, O(log n)-ish worst case for path graphs).
Deliberately join-free: Ray Data's native Dataset.join crashes when a
sparse side leaves a hash partition empty (see functions/joins.py), and
label tables here are sparse by nature. Convergence is a cheap global
sum(labels) check (labels only shrink, so an unchanged sum == fixpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import splitmix64


def connected_components(edges, src: str = "a", dst: str = "b",
                         max_iters: int = 50, num_buckets: int = 64):
    """Return a Dataset of (node, component) — component = min node id of
    the node's connected component. ``edges`` is a Dataset with int64
    columns ``src``/``dst``; isolated nodes (absent from edges) are the
    caller's to handle (each is trivially its own component)."""

    def _bkt(nodes: np.ndarray) -> pa.Array:
        return pa.array((splitmix64(nodes) % np.uint64(num_buckets))
                        .astype(np.int64))

    def undirect(t: pa.Table) -> pa.Table:
        a = t[src].combine_chunks().cast(pa.int64())
        b = t[dst].combine_chunks().cast(pa.int64())
        u = pa.concat_arrays([a, b])
        v = pa.concat_arrays([b, a])
        return pa.table({
            "bkt": _bkt(u.to_numpy(zero_copy_only=False)),
            "u": u, "v": v,
            "label": pa.nulls(len(u), pa.int64()),
        })

    # materialized once: reused every iteration (a lazy handle would
    # re-execute the upstream pair-mining pipeline per round)
    und = edges.map_batches(undirect, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        u = pc.unique(t["u"].combine_chunks())
        return pa.table({"node": u, "label": u})

    labels = (und.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").min("label")
              .map_batches(lambda t: t.rename_columns(["node", "label"]),
                           batch_format="pyarrow").materialize())

    def lift_lab(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks()
        return pa.table({
            "bkt": _bkt(n.to_numpy(zero_copy_only=False)),
            "u": n, "v": pa.nulls(len(t), pa.int64()),
            "label": t["label"].combine_chunks(),
        })

    def propose(g: pa.Table) -> pa.Table:
        """One hash bucket: label rows (v null) + adjacency rows (label
        null). Vectorized merge: attach label[u] to each adjacency row via
        searchsorted on the bucket's sorted label keys, then emit the
        label to every neighbor plus each node's own label."""
        lab_mask = pc.is_valid(g["label"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        nodes = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        labs = g["label"].combine_chunks().to_numpy(zero_copy_only=False)
        vs = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        lk, lv = nodes[lab_mask], labs[lab_mask]
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        eu, ev = nodes[~lab_mask], vs[~lab_mask]
        # every edge endpoint was seeded into labels, so lookups always hit
        lbl_u = lv[np.searchsorted(lk, eu)] if len(eu) else eu
        out_nodes = np.concatenate([lk, ev.astype(np.int64)])
        out_labels = np.concatenate([lv, lbl_u])
        return pa.table({"node": pa.array(out_nodes, pa.int64()),
                         "label": pa.array(out_labels, pa.int64())})

    prev = labels.sum("label")
    for _ in range(max_iters):
        lab_t = labels.map_batches(lift_lab, batch_format="pyarrow")
        labels = (lab_t.union(und)
                  .groupby("bkt").map_groups(propose, batch_format="pyarrow")
                  .groupby("node").min("label")
                  .map_batches(lambda t: t.rename_columns(["node", "label"]),
                               batch_format="pyarrow")
                  .materialize())
        cur = labels.sum("label")
        if cur == prev:
            break
        prev = cur
    return labels
