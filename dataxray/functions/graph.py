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

Each iteration is ONE cogroup shuffle (undirected adjacency unioned with
the label table, grouped by node) + one groupby-min — all-to-all volume
O(|E|) per round, rounds = O(cluster diameter) (2-4 for dup clusters,
O(log n) worst case for path graphs). Deliberately join-free: Ray Data's
native Dataset.join crashes when a sparse side leaves a hash partition
empty (see functions/joins.py), and label tables here are sparse by
nature. Convergence is detected with a cheap global sum(labels) aggregate
(labels only ever shrink, so an unchanged sum == fixpoint).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def connected_components(edges, src: str = "a", dst: str = "b",
                         max_iters: int = 50):
    """Return a Dataset of (node, component) — component = min node id of
    the node's connected component. ``edges`` is a Dataset with int64
    columns ``src``/``dst``; isolated nodes (absent from edges) are the
    caller's to handle (each is trivially its own component)."""

    def undirect(t: pa.Table) -> pa.Table:
        a = t[src].combine_chunks().cast(pa.int64())
        b = t[dst].combine_chunks().cast(pa.int64())
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

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
        return pa.table({"key": t["node"], "nbr": pa.nulls(len(t), pa.int64()),
                         "label": t["label"]})

    def lift_edge(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["u"], "nbr": t["v"],
                         "label": pa.nulls(len(t), pa.int64())})

    def propose(g: pa.Table) -> pa.Table:
        """One node's group: its label row(s) + its adjacency rows. Emit
        the label back to itself and to every neighbor."""
        lbl = pc.min(g["label"]).as_py()
        nbrs = g["nbr"].combine_chunks().drop_null()
        key = g["key"][0]
        nodes = pa.concat_arrays([pa.array([key.as_py()], pa.int64()),
                                  nbrs.cast(pa.int64())])
        return pa.table({"node": nodes,
                         "label": pa.array(
                             np.full(len(nodes), lbl, dtype=np.int64))})

    prev = labels.sum("label")
    for _ in range(max_iters):
        lab_t = labels.map_batches(lift_lab, batch_format="pyarrow")
        edge_t = und.map_batches(lift_edge, batch_format="pyarrow")
        labels = (lab_t.union(edge_t)
                  .groupby("key").map_groups(propose, batch_format="pyarrow")
                  .groupby("node").min("label")
                  .map_batches(lambda t: t.rename_columns(["node", "label"]),
                               batch_format="pyarrow")
                  .materialize())
        cur = labels.sum("label")
        if cur == prev:
            break
        prev = cur
    return labels
