"""Persistent IVF coarse-quantizer sidecar: train once, reuse across queries.

``functions.similarity.knn_ivf`` retrains its deterministic k-means
quantizer on every invocation — harmless for a one-shot query, wasteful for
a query service over a slowly-changing embedding table. This sidecar stores
the trained centroids keyed by an embedding-table VERSION string; queries
load them with one small parquet read, and a version mismatch (the table
changed under the index) triggers a retrain-and-overwrite.

Reference analog: the same persisted-checkpoint pattern as the stream
reader's status table (otsstreamreader/.../OTSStreamReaderMasterProxy.java
init:28-63) and the MinHash sidecar (state.dedup_index) — durable derived
state with an explicit staleness key, living beside the data it indexes.

Layout (over state.lakefs — local paths and object-store roots both work):
    root/
      _meta.json              {version, num_lists, dim, builds}
      centroids.parquet       (list_id i64, centroid fixed_size_list<f64>)

The single-object _meta.json PUT is the commit point (manifest pattern):
a crashed build leaves a stale-but-consistent index, never a torn one —
centroids.parquet is written BEFORE the meta that references it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from . import lakefs

META = "_meta.json"
CENTROIDS = "centroids.parquet"


def table_version(path: str) -> str:
    """Cheap deterministic version for a file-backed embedding table:
    path identity + byte size (a rewrite that changes nothing byte-for-byte
    keeps the index, any append/rewrite invalidates it)."""
    return f"{os.path.abspath(path)}:{os.path.getsize(path)}"


class IvfIndex:
    def __init__(self, root: str):
        self.root = root
        self.fs, self.base = lakefs.resolve(root)

    def _p(self, name: str) -> str:
        return os.path.join(self.base, name)

    def exists(self) -> bool:
        return self.fs.exists(self._p(META))

    def meta(self) -> dict:
        return self.fs.read_json(self._p(META))

    def centroids(self) -> np.ndarray:
        t = self.fs.read_parquet(self._p(CENTROIDS)).sort_by("list_id")
        col = t["centroid"].combine_chunks()
        dim = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(len(t), dim)

    def build(self, ds, version: str, num_lists: int = 16,
              train_sample: int = 4096, vec_col: str = "embedding") -> np.ndarray:
        """Train from a bounded head sample of ``ds`` and persist. Overwrites
        any previous index (the new meta PUT is the atomic switch)."""
        from ..functions.similarity import _matrix, train_ivf

        sample = ds.limit(train_sample).take_all()
        train = _matrix([r[vec_col] for r in sample], vec_col)
        cents = train_ivf(train, num_lists)
        self.fs.makedirs(self.base)
        dim = cents.shape[1]
        tbl = pa.table({
            "list_id": pa.array(np.arange(len(cents)), pa.int64()),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(cents.ravel(), pa.float64()), dim),
        })
        self.fs.write_parquet(tbl, self._p(CENTROIDS), compression="zstd")
        builds = self.meta().get("builds", 0) + 1 if self.exists() else 1
        self.fs.put_json(self._p(META), {
            "version": version, "num_lists": int(num_lists), "dim": int(dim),
            "train_sample": int(train_sample), "builds": builds,
        })
        return cents

    def get_or_build(self, ds, version: str, num_lists: int = 16,
                     train_sample: int = 4096,
                     vec_col: str = "embedding") -> np.ndarray:
        """Stored centroids when the version matches; retrain when the table
        moved under the index (staleness) or no index exists yet."""
        if self.exists():
            m = self.meta()
            if m.get("version") == version and m.get("num_lists") == num_lists:
                return self.centroids()
        return self.build(ds, version, num_lists=num_lists,
                          train_sample=train_sample, vec_col=vec_col)
