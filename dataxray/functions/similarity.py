"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(ray.put) and every batch does one numpy matmul against it (no shuffle, no
per-row python). Scale path: LSH bucketing by random-hyperplane signature —
batches only score against queries sharing a bucket prefix; recall is tuned
by the number of hyperplanes / probe multiplicity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(col, vec_col=None):
    """float64 matrix from an embedding column. Arrow list<float> inputs go
    through the flat values buffer (no per-row Python objects) when the list
    is rectangular — the embedding contract; python-list inputs (driver-side
    query rows) and ragged lists fall back to np.stack."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        if len(col) == 0:
            return np.zeros((0, 0), dtype=np.float64)
        mat = None
        if pa.types.is_fixed_size_list(col.type):
            flat = col.values.to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(col), col.type.list_size)
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offs = col.offsets.to_numpy()
            widths = np.diff(offs)
            if col.null_count == 0 and (widths == widths[0]).all():
                flat = col.values.to_numpy(zero_copy_only=False)
                mat = flat[offs[0]:offs[-1]].reshape(len(col), int(widths[0]))
        if mat is not None:
            mat = mat.astype(np.float64, copy=False)
            if not mat.flags.writeable:  # plasma buffers are read-only;
                mat = mat.copy()         # callers normalize in place
            return mat
        col = col.to_pylist()
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


class KnnScorer:
    """Actor-pool stage: per-batch top-k cosine against the broadcast queries.

    __init__ deserializes the query matrix once per actor; __call__ is a
    single (B×D)·(D×Q) matmul per batch + argpartition."""

    def __init__(self, queries_ref, k: int):
        import ray

        q_ids, q = ray.get(queries_ref)
        self.q_ids = q_ids
        self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        m = _matrix(batch["embedding"])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.q @ m.T  # (Q, B)
        # per-batch partial top-k: only k+1 candidates per query leave the
        # batch (+1 covers the query's own vector, filtered downstream), so
        # the final groupby shuffles Q x (k+1) rows per batch, never Q x B.
        # Candidates are chosen in the GLOBAL tie-break order (sim DESC,
        # neighbor_id ASC): an argpartition cut alone could drop a row tied
        # at the k-th similarity that the global reduce would rank inside
        # the top k (exact-duplicate embeddings hit this).
        keep = min(self.k + 1, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            if keep < len(s):
                cut = np.partition(s, len(s) - keep)[len(s) - keep]
                cand = np.flatnonzero(s >= cut)  # all ties at the cut included
            else:
                cand = np.arange(len(s))
            sel = cand[np.lexsort((ids[cand], -s[cand]))[:keep]]
            for j in sel:
                out_q.append(self.q_ids[qi])
                out_n.append(ids[j])
                out_s.append(s[j])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})


def _fetch_query_vectors(ds, query_ids: list[int], id_col: str, vec_col: str):
    """Materialize ONLY the Q query rows: predicate pushed into map_batches
    before take_all, so Q rows cross to the driver — never the dataset."""
    import pyarrow.compute as pc

    vals = pa.array(sorted(set(query_ids)), pa.int64())
    q_rows = ds.select_columns([id_col, vec_col]).map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=vals)),
        batch_format="pyarrow",
    ).take_all()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    return q_ids, _matrix([r[vec_col] for r in q_rows], vec_col)


def knn_bruteforce(ds, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k cosine neighbors for the given query ids (excluding self).

    Two passes: (1) fetch+broadcast the Q query vectors (filtered read — only
    Q rows reach the driver); (2) stream all batches through a scorer emitting
    per-batch candidates, then a small groupby(query_id) takes the global
    top-k — only Q×B candidate rows shuffle, never the embeddings."""
    import ray

    q_ids, q_mat = _fetch_query_vectors(ds, query_ids, id_col, vec_col)
    ref = ray.put((q_ids, q_mat))

    cands = ds.map_batches(KnnScorer, fn_constructor_args=(ref, k),
                           batch_format="pyarrow", batch_size=4096,
                           concurrency=2)
    cands = cands.filter(expr="query_id != neighbor_id")

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), ("neighbor_id", "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, len(g) + 1), pa.int64()))

    return cands.groupby("query_id").map_groups(topk, batch_format="pyarrow")


def train_ivf(vectors: np.ndarray, num_lists: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd's k-means over L2-normalized vectors (cosine ≙
    dot): init = first num_lists sample vectors, fixed iteration count, no
    RNG — same centroids on every node and every run."""
    v = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-30)
    c = v[:num_lists].copy()
    for _ in range(iters):
        assign = np.argmax(v @ c.T, axis=1)
        for j in range(len(c)):
            members = v[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-30)
    return c


class IvfAssign:
    """map_batches stage: nearest-centroid list id per vector. Plain callable
    (task pool, not actors): the centroid matrix is tiny (L×D floats) and
    ships in the closure — reserving actor CPUs for it would starve the other
    stages on small clusters."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.c = centroids
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch[self.vec_col])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        lists = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_list", pa.array(lists))


def knn_ivf(ds, query_ids: list[int], k: int = 5, num_lists: int = 16,
            nprobe: int = 4, train_sample: int = 4096,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroids: np.ndarray | None = None):
    """IVF ANN top-k: a deterministic k-means coarse quantizer partitions the
    vectors into inverted lists; each query probes only its nprobe nearest
    lists and scores exactly within them. The scale path when the LSH
    variant's recall tuning is awkward: recall rises monotonically with
    nprobe and hits 1.0 at nprobe=num_lists (= brute force).

    ``centroids`` skips the in-query training pass — pass a stored quantizer
    (state.ivf_index.IvfIndex) so repeated queries pay one small parquet
    read instead of a corpus sample + k-means per call. Training is
    deterministic, so stored-vs-retrained centroids are bit-identical for
    the same table version."""
    import ray

    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    else:
        sample = ds.limit(train_sample).take_all()
        train = _matrix([r[vec_col] for r in sample], vec_col)
        cents = train_ivf(train, num_lists)
    num_lists = len(cents)

    q_ids, q_mat = _fetch_query_vectors(ds, query_ids, id_col, vec_col)
    qn = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30)
    sims_qc = qn @ cents.T  # (Q, L)
    probe = min(nprobe, num_lists)
    probed = set(np.argpartition(-sims_qc, probe - 1, axis=1)[:, :probe]
                 .ravel().tolist())
    ref = ray.put((q_ids, q_mat))

    assigned = ds.map_batches(IvfAssign(cents, vec_col),
                              batch_format="pyarrow", batch_size=4096)
    in_lists = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["ivf_list"], value_set=pa.array(sorted(probed)))
        ),
        batch_format="pyarrow",
    )
    cands = in_lists.map_batches(KnnScorer, fn_constructor_args=(ref, k),
                                 batch_format="pyarrow", batch_size=4096,
                                 concurrency=2)
    cands = cands.filter(expr="query_id != neighbor_id")

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), ("neighbor_id", "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, len(g) + 1), pa.int64()))

    return cands.groupby("query_id").map_groups(topk, batch_format="pyarrow")


class LshBuckets:
    """Random-hyperplane LSH signatures: bucket = sign-bit string of r
    projections. Deterministic (fixed seed); same family for index and query."""

    def __init__(self, dim: int, num_planes: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_planes, dim))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0  # (N, r)
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch["embedding"])
        return batch.append_column("lsh_bucket", pa.array(self.bucket_of(m)))


def knn_lsh(ds, query_ids: list[int], k: int = 5, num_planes: int = 8,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """ANN top-k: score only vectors whose LSH bucket matches a query bucket.
    Approximate (recall < 1): the scale path when brute force stops fitting."""
    import ray

    first = ds.take(1)[0]
    dim = len(first[vec_col])
    lsh = LshBuckets(dim, num_planes)
    q_ids, q_mat = _fetch_query_vectors(ds, query_ids, id_col, vec_col)
    q_buckets = set(lsh.bucket_of(q_mat).tolist())
    ref = ray.put((q_ids, q_mat))

    bucketed = ds.map_batches(lsh, batch_format="pyarrow", batch_size=4096)
    in_buckets = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["lsh_bucket"], value_set=pa.array(sorted(q_buckets)))
        ),
        batch_format="pyarrow",
    )
    cands = in_buckets.map_batches(KnnScorer, fn_constructor_args=(ref, k),
                                   batch_format="pyarrow", batch_size=4096,
                                   concurrency=2)
    cands = cands.filter(expr="query_id != neighbor_id")

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), ("neighbor_id", "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(1, len(g) + 1), pa.int64()))

    return cands.groupby("query_id").map_groups(topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic distributed k-means (fixed-point accumulators)
# ---------------------------------------------------------------------------


def _det_sqdist(m, c):
    """Row-count-independent squared L2 distances: per-centroid elementwise
    multiply + axis sum (numpy pairwise over the FIXED dim length only) —
    BLAS gemm tiling varies with matrix shape and would let batch size
    perturb last-ulp values, flipping boundary argmins between layouts."""
    out = np.empty((m.shape[0], c.shape[0]), dtype=np.float64)
    for j in range(c.shape[0]):
        d = m - c[j]
        out[:, j] = (d * d).sum(axis=1)
    return out


def kmeans_fit_assign(ds, k: int = 8, iters: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      quant_bits: int = 20):
    """Lloyd's k-means over an embedding column, built to be a pure
    function of the data SET — layout/parallelism never changes a single
    assignment, so a one-process numpy model reproduces it exactly:

      * init: centroids = the vectors of the k smallest ids (deterministic,
        no RNG);
      * assign: squared-L2 argmin per batch (_det_sqdist — shape-stable
        arithmetic), ties to the lowest cluster index;
      * update: per-cluster sums accumulate in FIXED-POINT int64
        (vectors quantized at 2^quant_bits) through the tree combine —
        integer addition is associative/commutative, so the new centroid
        (sum / (n·2^bits), evaluated in float64 on the driver) is
        bit-identical whatever the block order. Float accumulation here
        would drift with layout and flip boundary assignments.

    Scale shape: per iteration one map_batches pass emitting flat
    (cluster, dim, s, n) int64 partial rows (k·d per batch), combined by
    the generic sum tree; the driver holds only the k×d centroid matrix,
    broadcast back via ray.put. Returns a Dataset of (id_col, cluster)."""
    import pyarrow.compute as pc
    import ray

    from ..stages.hashagg import tree_aggregate

    ds = ds.materialize()
    scale = float(1 << quant_bits)

    # ---- init: vectors of the k smallest ids (two tiny passes) ----
    def id_min(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pc.cast(t[id_col], pa.int64())}) \
            .sort_by(id_col).slice(0, k)

    small = pa.concat_tables(
        [b for b in ds.map_batches(id_min, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]).sort_by(id_col).slice(0, k)
    seed_ids = pa.array(sorted(small[id_col].to_pylist()), pa.int64())

    def seed_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        return t.filter(pc.is_in(ids, value_set=seed_ids))

    seeds = pa.concat_tables(
        [b for b in ds.map_batches(seed_rows, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]).sort_by(id_col)
    cent = _matrix(seeds[vec_col])[:k]

    for _ in range(iters):
        cent_ref = ray.put(cent)
        kk, dd = cent.shape

        def partial(t: pa.Table, cref=cent_ref, kk=kk, dd=dd) -> pa.Table:
            c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            m = _matrix(t[vec_col])
            a = np.argmin(_det_sqdist(m, c), axis=1)
            q = np.rint(m * scale).astype(np.int64)
            sums = np.zeros((kk, dd), dtype=np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            # flat (cluster, dim) rows so the generic int-sum tree combines
            # them — list columns would need a custom combiner
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(kk), dd), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dd), kk), pa.int64()),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, dd)),
            })

        agg = pa.concat_tables(ray.get(tree_aggregate(
            ds, ["cluster", "dim"], partial,
            {"s": "sum", "n": "sum"}).to_arrow_refs()))
        cl = agg["cluster"].to_numpy(zero_copy_only=False)
        dm = agg["dim"].to_numpy(zero_copy_only=False)
        sums = np.zeros((kk, dd), dtype=np.int64)
        cnt = np.zeros((kk, dd), dtype=np.int64)
        sums[cl, dm] = agg["s"].to_numpy(zero_copy_only=False)
        cnt[cl, dm] = agg["n"].to_numpy(zero_copy_only=False)
        nz = cnt[:, 0] > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / (cnt[nz, 0, None] * scale)

    cent_ref = ray.put(cent)

    def assign(t: pa.Table, cref=cent_ref) -> pa.Table:
        import pyarrow.compute as pc

        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        m = _matrix(t[vec_col])
        a = np.argmin(_det_sqdist(m, c), axis=1)
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")
