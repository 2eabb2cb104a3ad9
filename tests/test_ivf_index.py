"""Persistent IVF quantizer sidecar (state/ivf_index.py): train once, load
on later queries, retrain only when the table version moves."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataxray.functions.similarity import _matrix, knn_ivf, train_ivf
from dataxray.state.ivf_index import IvfIndex, table_version

pytestmark = pytest.mark.parametrize("scheme", ["", "mocks3://"])

N, DIM = 300, 16


def _write_embeddings(path: str, n: int = N, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, DIM))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), DIM),
    })
    pq.write_table(t, path)
    return path


@pytest.fixture
def emb_path(tmp_path):
    return _write_embeddings(str(tmp_path / "embeddings.parquet"))


def _ds(path):
    import ray.data

    return ray.data.read_parquet(path, override_num_blocks=2)


def test_build_load_roundtrip(ray_session, tmp_path, scheme, emb_path):
    idx = IvfIndex(scheme + str(tmp_path / "ivf"))
    v = table_version(emb_path)
    cents = idx.get_or_build(_ds(emb_path), v, num_lists=8)
    assert idx.meta()["builds"] == 1
    # same version → loads, no retrain
    again = idx.get_or_build(_ds(emb_path), v, num_lists=8)
    assert idx.meta()["builds"] == 1
    np.testing.assert_array_equal(cents, again)
    # stored centroids equal a direct deterministic retrain
    sample = _ds(emb_path).limit(4096).take_all()
    direct = train_ivf(_matrix([r["embedding"] for r in sample]), 8)
    np.testing.assert_allclose(idx.centroids(), direct)


def test_staleness_retrains(ray_session, tmp_path, scheme, emb_path):
    idx = IvfIndex(scheme + str(tmp_path / "ivf"))
    idx.get_or_build(_ds(emb_path), table_version(emb_path), num_lists=8)
    old = idx.centroids()
    # table rewritten with different content (version string changes)
    _write_embeddings(emb_path, n=N + 40, seed=8)
    v2 = table_version(emb_path)
    assert idx.meta()["version"] != v2
    fresh = idx.get_or_build(_ds(emb_path), v2, num_lists=8)
    assert idx.meta()["builds"] == 2
    assert idx.meta()["version"] == v2
    assert not np.array_equal(old, fresh)
    # a different num_lists request is also a staleness condition
    idx.get_or_build(_ds(emb_path), v2, num_lists=4)
    assert idx.meta()["builds"] == 3
    assert len(idx.centroids()) == 4


def test_knn_ivf_with_stored_centroids_matches_retrain(ray_session, tmp_path,
                                                       scheme, emb_path):
    """Stored-quantizer results are bit-identical to the retrain path."""
    idx = IvfIndex(scheme + str(tmp_path / "ivf"))
    cents = idx.get_or_build(_ds(emb_path), table_version(emb_path),
                             num_lists=8)

    def rows(res):
        return sorted((r["query_id"], r["neighbor_id"], r["rank"])
                      for r in res.take_all())

    stored = knn_ivf(_ds(emb_path), query_ids=[0, 1, 2], k=5, num_lists=8,
                     centroids=cents)
    retrain = knn_ivf(_ds(emb_path), query_ids=[0, 1, 2], k=5, num_lists=8)
    assert rows(stored) == rows(retrain)
