"""Distributed iterative graph algorithms — connected components (dup-pair
clustering) and PageRank — on a shared raw-task iteration engine.

Dedup stages (MinHash/LSH, n-gram Jaccard, SimHash, embedding cosine) emit
PAIRS; choosing one representative per duplicate *cluster* needs the
transitive closure (min-label propagation, the MapReduce-CC family,
Kiveris et al. SoCC'14). PageRank ranks the same graphs.

The engine (both algorithms): the STATIC adjacency hash-buckets by
splitmix64(node) % B exactly once — raw split tasks (``num_returns=B``)
feeding per-bucket concat/prep tasks, the direct-exchange machinery —
into per-bucket object refs that never move again. Each round is then
pure raw tasks: B message tasks read (state[b], adj[b]) and emit B
pre-aggregated slices keyed by target bucket (MIN for labels, SUM for
rank mass), plus B update tasks folding incoming slices into the bucket's
state vector; the driver holds only per-round scalars (changed-count /
dangling mass). Per-round traffic is O(distinct (source bucket, target)
pairs) — never an O(|E|) re-exchange of the graph — and a node's state
and all its out-edges share a bucket, so degrees/dangling/convergence are
bucket-local. This is the documented "(c) raw Ray tasks" escape hatch:
the Dataset API has no way to iterate against pinned per-bucket state
without re-shuffling the static side every round.

Deliberately join-free (Ray Data's native join crashes on empty sparse
hash partitions, see functions/joins.py). Partitioning assumption: one
bucket holds all out-edges of its nodes — a single super-degree source
bounds that bucket's memory; split such rows upstream if the graph has
them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import splitmix64


def connected_components(edges, src: str = "a", dst: str = "b",
                         max_iters: int = 50, num_buckets: int = 32):
    """Return a Dataset of (node, component) — component = min node id of
    the node's connected component. ``edges`` is a Dataset with int64
    columns ``src``/``dst``; isolated nodes (absent from edges) are the
    caller's to handle (each is trivially its own component).

    Same raw-task iteration engine as pagerank: the UNDIRECTED adjacency
    (each edge stored both ways) hash-buckets by splitmix64(node) % B
    ONCE into per-bucket object refs and never moves again; each round is
    B propose tasks (label[u] pushed along out-edges, pre-MINNED per
    (target bucket, target node), sliced via num_returns) + B update
    tasks (label = min(own, incoming)) + one driver-side sum of B
    changed-counts — convergence is exact (stop when no label moved).
    Per-round traffic is O(distinct (src-bucket, neighbor) pairs); labels
    only ever shrink, min is order-free, so the result is layout-exact.
    Rounds = O(component diameter) (2-4 for dup clusters)."""
    import ray

    B = num_buckets

    def _bkt(nodes: np.ndarray) -> np.ndarray:
        return (splitmix64(nodes) % np.uint64(B)).astype(np.int64)

    def undirect(t: pa.Table) -> pa.Table:
        from ..schema import PART_COL

        a = t[src].combine_chunks().cast(pa.int64())
        b = t[dst].combine_chunks().cast(pa.int64())
        u = pa.concat_arrays([a, b])
        v = pa.concat_arrays([b, a])
        return pa.table({
            PART_COL: pa.array(
                _bkt(u.to_numpy(zero_copy_only=False)).astype(np.int32)),
            "u": u, "v": v})

    blocks = list(edges.map_batches(undirect, batch_format="pyarrow")
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
    def prep(*parts):
        """Per-bucket adjacency as (eu, ev) sorted by (u, v) — every node
        with any edge appears as a source here (undirected doubling)."""
        ts = [t for t in parts if t is not None and len(t)]
        if not ts:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
        t = pa.concat_tables(ts, promote_options="permissive")
        eu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ev = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, eu))
        return eu[order], ev[order]

    adj_ref = {b: prep.remote(*[pc_[b] for pc_ in pieces])
               for b in range(B)}

    @ray.remote(num_cpus=1)
    def init_labels(adj):
        eu, _ = adj
        nodes = np.unique(eu)  # every endpoint is a source after doubling
        return nodes, nodes.copy()

    lab_ref = {b: init_labels.remote(adj_ref[b]) for b in range(B)}

    @ray.remote(num_cpus=1, num_returns=max(B, 2))
    def propose(lab, adj):
        """Per-target-bucket (node, min incoming label) slices."""
        nodes, labels = lab
        eu, ev = adj
        if len(eu) == 0:
            out = []
        else:
            msg = labels[np.searchsorted(nodes, eu)]
            tb = _bkt(ev)
            order = np.lexsort((ev, tb))
            tb, tv, tm = tb[order], ev[order], msg[order]
            newrun = np.ones(len(tv), dtype=bool)
            newrun[1:] = (tv[1:] != tv[:-1]) | (tb[1:] != tb[:-1])
            starts = np.flatnonzero(newrun)
            mins = np.minimum.reduceat(tm, starts)
            rv, rb = tv[starts], tb[starts]
            bounds = np.searchsorted(rb, np.arange(B + 1))
            out = [(rv[bounds[i]:bounds[i + 1]],
                    mins[bounds[i]:bounds[i + 1]]) for i in range(B)]
        while len(out) < max(B, 2):
            out.append(None)
        return tuple(out)

    @ray.remote(num_cpus=1, num_returns=2)
    def update(lab, *slices):
        nodes, labels = lab
        new = labels.copy()
        for s in slices:
            if s is None or len(s[0]) == 0:
                continue
            nv, ml = s
            pos = np.searchsorted(nodes, nv)
            np.minimum.at(new, pos, ml)
        changed = int((new != labels).sum())
        return (nodes, new), changed

    for _ in range(max_iters):
        outs = {b: propose.remote(lab_ref[b], adj_ref[b]) for b in range(B)}
        results = {b: update.remote(lab_ref[b],
                                    *[outs[q][b] for q in range(B)])
                   for b in range(B)}
        lab_ref = {b: results[b][0] for b in range(B)}
        if sum(ray.get([results[b][1] for b in range(B)])) == 0:
            break

    @ray.remote(num_cpus=1)
    def emit(lab) -> pa.Table:
        nodes, labels = lab
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "label": pa.array(labels, pa.int64())})

    import ray.data

    refs = [emit.remote(lab_ref[b]) for b in range(B)]
    sizes = [len(t) for t in ray.get(refs)]
    keep = [r for r, n in zip(refs, sizes) if n]
    if not keep:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(keep)


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


def bfs_distances(edges, source: int, src: str = "a", dst: str = "b",
                  max_iters: int = 10_000, num_buckets: int = 32,
                  undirected: bool = True):
    """Hop distances from ``source`` (BFS / unit-weight SSSP) — the third
    algorithm on the raw-task iteration engine: identical shape to
    connected_components with the min-combine over dist+1 instead of
    labels (min-plus semiring). Returns a Dataset of (node, dist) for
    REACHABLE nodes only; converges in eccentricity(source) rounds via the
    exact changed-count check."""
    import ray

    B = num_buckets
    INF = np.int64(np.iinfo(np.int64).max // 2)

    def _bkt(nodes: np.ndarray) -> np.ndarray:
        return (splitmix64(nodes) % np.uint64(B)).astype(np.int64)

    def lift(t: pa.Table) -> pa.Table:
        from ..schema import PART_COL

        a = t[src].combine_chunks().cast(pa.int64())
        b = t[dst].combine_chunks().cast(pa.int64())
        if undirected:
            u = pa.concat_arrays([a, b])
            v = pa.concat_arrays([b, a])
        else:
            u, v = a, b
        return pa.table({
            PART_COL: pa.array(
                _bkt(u.to_numpy(zero_copy_only=False)).astype(np.int32)),
            "u": u, "v": v})

    blocks = list(edges.map_batches(lift, batch_format="pyarrow")
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
    def prep(*parts):
        ts = [t for t in parts if t is not None and len(t)]
        if not ts:
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
        t = pa.concat_tables(ts, promote_options="permissive")
        eu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        ev = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ev, eu))
        return eu[order], ev[order]

    adj_ref = {b: prep.remote(*[pc_[b] for pc_ in pieces])
               for b in range(B)}

    @ray.remote(num_cpus=1)
    def init_state(adj, b: int):
        eu, ev = adj
        nodes = np.unique(np.concatenate([eu, ev]))
        nodes = nodes[_bkt(nodes) == b]  # targets may hash elsewhere
        dist = np.full(len(nodes), INF)
        hit = np.searchsorted(nodes, source)
        if hit < len(nodes) and nodes[hit] == source:
            dist[hit] = 0
        return nodes, dist

    st_ref = {b: init_state.remote(adj_ref[b], b) for b in range(B)}

    @ray.remote(num_cpus=1, num_returns=max(B, 2))
    def propose(state, adj):
        nodes, dist = state
        eu, ev = adj
        out = []
        if len(eu):
            d = dist[np.searchsorted(nodes, eu)]
            live = d < INF
            if live.any():
                tv, tm = ev[live], d[live] + 1
                tb = _bkt(tv)
                order = np.lexsort((tv, tb))
                tb, tv, tm = tb[order], tv[order], tm[order]
                newrun = np.ones(len(tv), dtype=bool)
                newrun[1:] = (tv[1:] != tv[:-1]) | (tb[1:] != tb[:-1])
                starts = np.flatnonzero(newrun)
                mins = np.minimum.reduceat(tm, starts)
                rv, rb = tv[starts], tb[starts]
                bounds = np.searchsorted(rb, np.arange(B + 1))
                out = [(rv[bounds[i]:bounds[i + 1]],
                        mins[bounds[i]:bounds[i + 1]]) for i in range(B)]
        while len(out) < max(B, 2):
            out.append(None)
        return tuple(out)

    @ray.remote(num_cpus=1, num_returns=2)
    def update(state, *slices):
        nodes, dist = state
        new = dist.copy()
        for s in slices:
            if s is None or len(s[0]) == 0:
                continue
            nv, md = s
            np.minimum.at(new, np.searchsorted(nodes, nv), md)
        return (nodes, new), int((new != dist).sum())

    for _ in range(max_iters):
        outs = {b: propose.remote(st_ref[b], adj_ref[b]) for b in range(B)}
        results = {b: update.remote(st_ref[b],
                                    *[outs[q][b] for q in range(B)])
                   for b in range(B)}
        st_ref = {b: results[b][0] for b in range(B)}
        if sum(ray.get([results[b][1] for b in range(B)])) == 0:
            break

    @ray.remote(num_cpus=1)
    def emit(state) -> pa.Table:
        nodes, dist = state
        keep = dist < INF
        return pa.table({"node": pa.array(nodes[keep], pa.int64()),
                         "dist": pa.array(dist[keep], pa.int64())})

    import ray.data

    refs = [emit.remote(st_ref[b]) for b in range(B)]
    tables = ray.get(refs)
    keep = [r for r, t in zip(refs, tables) if len(t)]
    if not keep:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(keep)
