"""Deterministic k-means: layout invariance against the numpy mirror."""
import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.parametrize("blocks", [1, 13])
def test_kmeans_layout_invariant(ray_session, blocks):
    import ray.data

    from dataxray.functions.similarity import kmeans_fit_assign

    rng = np.random.default_rng(3)
    n, d, k = 400, 8, 5
    centers = rng.normal(size=(k, d)) * 4
    m = centers[rng.integers(0, k, n)] + rng.normal(size=(n, d))
    m = m.astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in m],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_fit_assign(ds, k=k, iters=4).take_all()}

    # numpy mirror (same fixed-point update, same shape-stable distance)
    mm = m.astype(np.float64)
    scale = float(1 << 20)
    cent = mm[:k].copy()

    def sqdist(x, c):
        out = np.empty((x.shape[0], c.shape[0]))
        for j in range(c.shape[0]):
            dd = x - c[j]
            out[:, j] = (dd * dd).sum(axis=1)
        return out

    for _ in range(4):
        a = np.argmin(sqdist(mm, cent), axis=1)
        q = np.rint(mm * scale).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, a, q)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        nz = cnt > 0
        cent[nz] = sums[nz] / (cnt[nz, None] * scale)
    want = np.argmin(sqdist(mm, cent), axis=1)
    assert got == {i: int(want[i]) for i in range(n)}
    assert len(set(got.values())) == k  # well-separated planted clusters
