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


def pagerank(edges, src: str = "a", dst: str = "b", iters: int = 10,
             damping: float = 0.85, num_buckets: int = 64):
    """Distributed PageRank (Page et al. 1999, power iteration with the
    dangling-mass correction), fixed ``iters`` rounds. ``edges`` is a
    Dataset of int64 (src, dst) rows — duplicates count as parallel edges.
    Returns a Dataset of (node, rank), ranks summing to 1.

    Same join-free shape as connected_components: per round, rank rows and
    the static adjacency rows cogroup in splitmix64(node) hash buckets.
    Because a node's rank row and ALL its out-edges land in the same
    bucket, both the out-degree (for the 1/deg edge weight) and dangling
    detection are exact bucket-local computations — no degree broadcast,
    no driver-side node state, ever. Each edge becomes a contribution
    rank[u]/deg[u] on its target; each dangling rank row becomes mass on
    a sentinel node, redistributed uniformly by the update map together
    with the teleport term. One groupby-sum per round; all-to-all volume
    O(|E|) per round; the driver holds only scalar dangling mass."""
    SENT = np.int64(-1)

    def _bkt(nodes: np.ndarray) -> pa.Array:
        return pa.array((splitmix64(nodes) % np.uint64(num_buckets))
                        .astype(np.int64))

    def adjac(t: pa.Table) -> pa.Table:
        u = t[src].combine_chunks().cast(pa.int64())
        v = t[dst].combine_chunks().cast(pa.int64())
        return pa.table({
            "bkt": _bkt(u.to_numpy(zero_copy_only=False)),
            "u": u, "v": v,
            "w": pa.nulls(len(u), pa.float64()),  # rank slot (null = edge)
        })

    und = edges.map_batches(adjac, batch_format="pyarrow").materialize()

    def init_nodes(t: pa.Table) -> pa.Table:
        n = pc.unique(pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()]))
        return pa.table({"node": n})

    nodes = (und.map_batches(init_nodes, batch_format="pyarrow")
             .groupby("node").count()
             .map_batches(lambda t: t.select(["node"]),
                          batch_format="pyarrow").materialize())
    n_nodes = nodes.count()
    r0 = 1.0 / n_nodes

    ranks = nodes.map_batches(
        lambda t: t.append_column("rank",
                                  pa.array([r0] * len(t), pa.float64())),
        batch_format="pyarrow").materialize()

    def lift(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks()
        return pa.table({
            "bkt": _bkt(n.to_numpy(zero_copy_only=False)),
            "u": n, "v": pa.nulls(len(t), pa.int64()),
            "w": t["rank"].combine_chunks(),  # rank rides the w slot
        })

    def contribute(g: pa.Table) -> pa.Table:
        isrank = pc.is_null(g["v"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        us = g["u"].combine_chunks().to_numpy(zero_copy_only=False)
        vs = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        ws = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        rk, rv = us[isrank], ws[isrank]
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        eu, ev = us[~isrank], vs[~isrank]
        if len(eu):
            # bucket-local == global out-degree: all of u's edges are here
            uq, counts = np.unique(eu, return_counts=True)
            pos = np.searchsorted(rk, eu)
            contrib = rv[pos] / counts[np.searchsorted(uq, eu)]
            dangling = ~np.isin(rk, uq)
        else:
            contrib = np.zeros(0)
            dangling = np.ones(len(rk), dtype=bool)
        out_n = np.concatenate([rk,                      # presence (0 mass)
                                ev.astype(np.int64),
                                np.full(int(dangling.sum()), SENT)])
        out_m = np.concatenate([np.zeros(len(rk)), contrib, rv[dangling]])
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "mass": pa.array(out_m, pa.float64())})

    for _ in range(iters):
        inflow = (ranks.map_batches(lift, batch_format="pyarrow")
                  .union(und)
                  .groupby("bkt").map_groups(contribute,
                                             batch_format="pyarrow")
                  .groupby("node").sum("mass")
                  .map_batches(lambda t: t.rename_columns(["node", "mass"]),
                               batch_format="pyarrow")
                  .materialize())
        dsum = inflow.map_batches(
            lambda t: t.filter(pc.equal(t["node"], SENT)),
            batch_format="pyarrow").sum("mass", ignore_nulls=True) or 0.0
        base = (1.0 - damping) / n_nodes + damping * dsum / n_nodes

        def update(t: pa.Table, b=base) -> pa.Table:
            t = t.filter(pc.not_equal(t["node"], SENT))
            m = t["mass"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"node": t["node"],
                             "rank": pa.array(b + damping * m,
                                              pa.float64())})

        ranks = inflow.map_batches(update,
                                   batch_format="pyarrow").materialize()
    return ranks
