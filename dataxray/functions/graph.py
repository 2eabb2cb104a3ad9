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
             damping: float = 0.85, num_buckets: int = 32):
    """Distributed PageRank (Page et al. 1999, damped power iteration with
    exact dangling redistribution), fixed ``iters`` rounds over a Dataset
    of int64 (src, dst) rows (duplicates = parallel edges). Returns a
    Dataset of (node, rank), ranks summing to 1.

    Shape, built for iteration: the adjacency is hash-bucketed by
    splitmix64(src) % B ONCE (raw-task split/concat — the direct-exchange
    machinery) and then NEVER moves again; per round only rank vectors and
    pre-aggregated contributions travel. Each round is exactly B contrib
    tasks (rank[u]/deg[u] per edge, summed per (target bucket, target
    node), sliced into B outputs via num_returns) + B update tasks (sum
    incoming slices, add teleport + dangling terms) + one driver-side sum
    of B dangling scalars. No Dataset shuffle, no sort, no re-reading of
    edges: per-round traffic is O(distinct (src-bucket, dst) pairs), never
    O(|E|) re-exchange of the static graph. Because a node's rank row and
    all its out-edges share a bucket, out-degree and dangling detection
    are exact bucket-local computations — no degree broadcast, no driver
    node state beyond two scalars. Caveat (documented partitioning
    assumption): one bucket holds ALL out-edges of its nodes, so a single
    node with a super-massive out-degree bounds that bucket's memory —
    split such source rows upstream if the graph has them."""
    import ray

    B = num_buckets

    def _bkt(nodes: np.ndarray) -> np.ndarray:
        return (splitmix64(nodes) % np.uint64(B)).astype(np.int64)

    def adjac(t: pa.Table) -> pa.Table:
        u = t[src].combine_chunks().cast(pa.int64())
        v = t[dst].combine_chunks().cast(pa.int64())
        from ..schema import PART_COL

        return pa.table({
            PART_COL: pa.array(
                _bkt(u.to_numpy(zero_copy_only=False)).astype(np.int32)),
            "u": u, "v": v})

    blocks = list(edges.map_batches(adjac, batch_format="pyarrow")
                  .materialize().to_arrow_refs())

    from ..stages.exchange import split_by_part

    @ray.remote(num_cpus=1, num_returns=max(B, 2))
    def split(block: pa.Table):
        out = split_by_part(block, B)
        while len(out) < max(B, 2):
            out.append(None)
        return tuple(out)

    pieces = [split.remote(b) for b in blocks]

    @ray.remote(num_cpus=1)
    def prep(b: int, *parts):
        """Per-bucket prepared adjacency: edge arrays sorted by (u, v),
        per-edge 1/deg weights, plus this bucket's node set (ALL endpoints
        hashing here — targets and isolated-by-direction nodes included)."""
        ts = [t for t in parts if t is not None and len(t)]
        if ts:
            t = pa.concat_tables(ts, promote_options="permissive")
            eu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
            ev = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((ev, eu))
            eu, ev = eu[order], ev[order]
            uq, counts = np.unique(eu, return_counts=True)
            w = 1.0 / counts[np.searchsorted(uq, eu)]
        else:
            eu = ev = np.zeros(0, dtype=np.int64)
            w = np.zeros(0)
        return eu, ev, w

    # node discovery: every endpoint, bucketed by its own hash
    @ray.remote(num_cpus=1, num_returns=max(B, 2))
    def node_split(block: pa.Table):
        ns = np.unique(np.concatenate([
            block["u"].combine_chunks().to_numpy(zero_copy_only=False),
            block["v"].combine_chunks().to_numpy(zero_copy_only=False)]))
        bs = _bkt(ns)
        order = np.argsort(bs, kind="stable")
        ns, bs = ns[order], bs[order]
        bounds = np.searchsorted(bs, np.arange(B + 1))
        out = [ns[bounds[i]:bounds[i + 1]] for i in range(B)]
        while len(out) < max(B, 2):
            out.append(None)
        return tuple(out)

    @ray.remote(num_cpus=1)
    def node_merge(*parts):
        parts = [p for p in parts if p is not None and len(p)]
        if not parts:
            return np.zeros(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    npieces = [node_split.remote(b) for b in blocks]
    nodes_ref = {b: node_merge.remote(*[np[b] for np in npieces])
                 for b in range(B)}
    adj_ref = {b: prep.remote(b, *[pc_[b] for pc_ in pieces])
               for b in range(B)}
    @ray.remote(num_cpus=1)
    def count_nodes(nodes) -> int:
        return int(len(nodes))

    n_nodes = int(sum(ray.get(
        [count_nodes.remote(nodes_ref[b]) for b in range(B)])))
    r0 = 1.0 / n_nodes

    @ray.remote(num_cpus=1)
    def init_rank(nodes: np.ndarray):
        return nodes, np.full(len(nodes), r0)

    rank_ref = {b: init_rank.remote(nodes_ref[b]) for b in range(B)}

    @ray.remote(num_cpus=1, num_returns=max(B, 2) + 1)
    def contrib(rank, adj):
        """B (node, mass) slices keyed by target bucket + dangling scalar."""
        nodes, r = rank
        eu, ev, w = adj
        if len(eu):
            pos = np.searchsorted(nodes, eu)  # every source is a bucket node
            mass = r[pos] * w
            # pre-aggregate per (target bucket, target node)
            tb = _bkt(ev)
            order = np.lexsort((ev, tb))
            tb, tv, tm = tb[order], ev[order], mass[order]
            # sum runs of equal (tb, tv)
            newrun = np.ones(len(tv), dtype=bool)
            newrun[1:] = (tv[1:] != tv[:-1]) | (tb[1:] != tb[:-1])
            starts = np.flatnonzero(newrun)
            sums = np.add.reduceat(tm, starts)
            rv, rb = tv[starts], tb[starts]
            bounds = np.searchsorted(rb, np.arange(B + 1))
            out = [(rv[bounds[i]:bounds[i + 1]],
                    sums[bounds[i]:bounds[i + 1]]) for i in range(B)]
            dangling = float(r[~np.isin(nodes, eu)].sum())
        else:
            out = [(np.zeros(0, dtype=np.int64), np.zeros(0))
                   for _ in range(B)]
            dangling = float(r.sum())
        while len(out) < max(B, 2):
            out.append(None)
        return (*out, dangling)

    @ray.remote(num_cpus=1)
    def update(nodes: np.ndarray, base: float, *slices):
        inflow = np.zeros(len(nodes))
        for s in slices:
            if s is None or len(s[0]) == 0:
                continue
            nv, ms = s
            np.add.at(inflow, np.searchsorted(nodes, nv), ms)
        return nodes, base + damping * inflow

    for _ in range(iters):
        outs = {b: contrib.remote(rank_ref[b], adj_ref[b]) for b in range(B)}
        dsum = float(sum(ray.get([outs[b][max(B, 2)] for b in range(B)])))
        base = (1.0 - damping) / n_nodes + damping * dsum / n_nodes
        rank_ref = {b: update.remote(nodes_ref[b], base,
                                     *[outs[q][b] for q in range(B)])
                    for b in range(B)}

    @ray.remote(num_cpus=1)
    def emit(rank) -> pa.Table:
        nodes, r = rank
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "rank": pa.array(r, pa.float64())})

    import ray.data

    refs = [emit.remote(rank_ref[b]) for b in range(B)]
    sizes = ray.get([count_nodes.remote(nodes_ref[b]) for b in range(B)])
    keep = [r for r, n in zip(refs, sizes) if n]
    if not keep:
        return ray.data.from_items([])
    # settle refs before Dataset construction (see manifest.changes: a Ray
    # core ref-count race on still-pending inlined outputs)
    ray.wait(keep, num_returns=len(keep), fetch_local=False)
    return ray.data.from_arrow_refs(keep)
