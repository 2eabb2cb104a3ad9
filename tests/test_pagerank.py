"""Distributed PageRank vs a numpy power-iteration reference."""
import numpy as np
import pyarrow as pa
import pytest


def _np_pagerank(u, v, iters=10, d=0.85):
    nodes = np.unique(np.concatenate([u, v]))
    idx = {n: i for i, n in enumerate(nodes)}
    ui = np.array([idx[x] for x in u])
    vi = np.array([idx[x] for x in v])
    n = len(nodes)
    deg = np.bincount(ui, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        inflow = np.zeros(n)
        np.add.at(inflow, vi, r[ui] / deg[ui])
        r = (1 - d) / n + d * (inflow + dangling / n)
    return dict(zip(nodes.tolist(), r.tolist()))


@pytest.mark.parametrize("blocks", [1, 16])
def test_pagerank_random_graph(ray_session, blocks):
    import ray.data

    from dataxray.functions.graph import pagerank

    rng = np.random.default_rng(11)
    m = 3000
    u = rng.integers(0, 200, size=m).astype(np.int64)
    v = rng.integers(0, 260, size=m).astype(np.int64)  # 200..259 dangling
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(u), "b": pa.array(v)})).repartition(blocks)
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, iters=8, num_buckets=16).take_all()}
    want = _np_pagerank(u, v, iters=8)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_star_graph(ray_session):
    """Hub-and-spoke sanity: the hub out-ranks every leaf."""
    import ray.data

    from dataxray.functions.graph import pagerank

    u = np.array([i for i in range(1, 9)], dtype=np.int64)
    v = np.zeros(8, dtype=np.int64)  # all leaves point at node 0
    ds = ray.data.from_arrow(pa.table({"a": pa.array(u), "b": pa.array(v)}))
    got = {r["node"]: r["rank"] for r in pagerank(ds, iters=12).take_all()}
    assert got[0] > max(got[i] for i in range(1, 9)) * 3
    assert abs(sum(got.values()) - 1.0) < 1e-9
