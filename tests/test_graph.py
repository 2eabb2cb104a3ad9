"""Connected components (dataxray/functions/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_components(edges):
    """Reference union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per node
    return {n: find(n) for n in list(parent)}


def _run(edges_list, blocks=6):
    import ray.data

    from dataxray.functions.graph import connected_components

    t = pa.table({"a": pa.array([e[0] for e in edges_list], pa.int64()),
                  "b": pa.array([e[1] for e in edges_list], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = connected_components(ds).to_pandas()
    return dict(zip(out["node"], out["label"]))


def test_cc_basic_clusters():
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = _run(edges)
    assert got == _uf_components(edges)
    assert got[3] == 1 and got[11] == 10 and got[22] == 20


def test_cc_path_graph_needs_iterations():
    # a long path exercises multi-round propagation (diameter ~ n)
    edges = [(i, i + 1) for i in range(30)]
    got = _run(edges)
    assert set(got.values()) == {0}


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_random_matches_union_find(seed):
    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(80, 2)) if a != b]
    got = _run(edges, blocks=8)
    assert got == _uf_components(edges)


@pytest.mark.parametrize("blocks", [1, 16])
def test_bfs_matches_reference(ray_session, blocks):
    """Distributed BFS == deque BFS on a random graph with an unreachable
    island; path graph exercises multi-round convergence."""
    from collections import deque

    import ray.data

    from dataxray.functions.graph import bfs_distances

    rng = np.random.default_rng(5)
    m = 2000
    u = rng.integers(0, 150, size=m).astype(np.int64)
    v = rng.integers(0, 150, size=m).astype(np.int64)
    # island 900..905 (a path), unreachable from 0..149
    iu = np.array([900, 901, 902, 903, 904], dtype=np.int64)
    iv = iu + 1
    u, v = np.concatenate([u, iu]), np.concatenate([v, iv])
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(u), "b": pa.array(v)})).repartition(blocks)
    got = {r["node"]: r["dist"]
           for r in bfs_distances(ds, source=0, num_buckets=16).take_all()}

    adj = {}
    for a, b in zip(u.tolist(), v.tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {0: 0}
    q = deque([0])
    while q:
        n = q.popleft()
        for nb in adj[n]:
            if nb not in dist:
                dist[nb] = dist[n] + 1
                q.append(nb)
    assert got == dist
    assert all(900 + i not in got for i in range(6))  # island excluded

    # path island BFS from inside it: multi-round frontier expansion
    got2 = {r["node"]: r["dist"]
            for r in bfs_distances(ds, source=900,
                                   num_buckets=16).take_all()}
    assert got2 == {900 + i: i for i in range(6)}
