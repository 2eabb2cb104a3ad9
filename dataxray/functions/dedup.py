"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — first-class components of a web-scale training-data
pipeline (the reference delegates all dedup to destination key constraints,
WriterUtil.java:110-167; here we own it, SURVEY.md §2.4).

Scale shapes:
  * exact        — hash column in map_batches → groupby(hash) keep-first:
                   one shuffle of (hash, id) pairs only.
  * MinHash+LSH  — per-batch signature computation (numpy), flat-map to
                   (band_id, band_hash, doc_id) rows, groupby band bucket →
                   candidate pairs, verify Jaccard. Only signatures shuffle.
  * SimHash      — 64-bit signature per doc; candidates share one of four
                   16-bit chunks (Hamming ≤ r by pigeonhole).
  * embedding    — blockwise cosine against a broadcast (ray.put) matrix —
                   no shuffle; the LSH/IVF variant buckets first at scale.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_key(batch: pa.Table, col: str = "text", out: str = "content_key") -> pa.Table:
    """md5 hex of the column (matches DuckDB md5() for the oracle)."""
    import hashlib

    vals = [hashlib.md5(v.encode()).hexdigest() if v is not None else ""
            for v in batch[col].to_pylist()]
    return batch.append_column(out, pa.array(vals, pa.string()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content. groupby shuffles only after
    the content key exists, so equal rows co-locate by hash."""
    ds = ds.map_batches(lambda t: add_content_key(t, col), batch_format="pyarrow")

    def keep_first(g: pa.Table) -> pa.Table:
        return g.sort_by(id_col).slice(0, 1)

    return ds.groupby("content_key").map_groups(keep_first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Per-batch MinHash signatures over word k-shingles.

    Universal hashing: sig_j(doc) = min over shingles s of (a_j·h(s)+b_j mod p).
    a/b drawn once from a fixed seed (deterministic across runs). The numpy
    inner product vectorizes over (shingles × permutations) per doc.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.k = shingle_k
        self.a = rng.integers(1, 1 << 60, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 60, size=num_perm, dtype=np.uint64)

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        if len(toks) < self.k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]
        return np.unique(
            np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.uint64,
                        count=len(grams))
        )

    def signature(self, text: str) -> np.ndarray:
        h = self.shingles(text)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (S,1)*(P,) -> (S,P); 61-bit mod keeps products exact in uint64? No —
        # a·h can exceed 64 bits, but overflow wraps mod 2^64 consistently on
        # every node, which is all a hash family needs (determinism, spread).
        vals = (h[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.astype(np.int64) for s in sigs], pa.list_(pa.int64()))
        )


def explode_bands(batch: pa.Table, num_bands: int, id_col: str = "doc_id") -> pa.Table:
    """(doc, signature) → one row per band: (band_key, doc_id). band_key folds
    (band_id, band_hash) into one string so a single-column groupby buckets it."""
    ids, keys = [], []
    for did, sig in zip(batch[id_col].to_pylist(), batch["minhash"].to_pylist()):
        sig = np.asarray(sig, dtype=np.uint64)
        rows = len(sig) // num_bands
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            keys.append(f"{b}:{zlib.crc32(band.tobytes()):08x}")
            ids.append(did)
    return pa.table({"band_key": pa.array(keys, pa.string()), id_col: pa.array(ids)})


def candidate_pairs_from_bucket(g: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids = sorted(g[id_col].to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard (verification step after LSH)."""
    mh = MinHasher(shingle_k=k)
    sa, sb = set(mh.shingles(text_a).tolist()), set(mh.shingles(text_b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_dedup_pairs(ds, num_perm: int = 64, num_bands: int = 16,
                        shingle_k: int = 3, threshold: float = 0.7,
                        id_col: str = "doc_id"):
    """Full MinHash-LSH near-dup pipeline → verified candidate pairs
    (id_a, id_b, jaccard ≥ threshold). Text lookup for verification is a
    broadcast of (id → text) — suitable while the dup-candidate set is small
    relative to the corpus; at 100 TB the verify joins back by id instead."""
    import ray

    texts_ref = ray.put(
        {r[id_col]: r["text"] for r in ds.select_columns([id_col, "text"]).take_all()}
    )
    sig = ds.map_batches(MinHasher(num_perm, shingle_k), batch_format="pyarrow",
                         batch_size=1024)
    bands = sig.map_batches(
        lambda t: explode_bands(t.select([id_col, "minhash"]), num_bands, id_col),
        batch_format="pyarrow",
    )
    pairs = bands.groupby("band_key").map_groups(
        lambda g: candidate_pairs_from_bucket(g, id_col), batch_format="pyarrow"
    )

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        seen = set()
        rows = {"id_a": [], "id_b": [], "jaccard": []}
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            j = jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
            if j >= threshold:
                rows["id_a"].append(a)
                rows["id_b"].append(b)
                rows["jaccard"].append(j)
        return pa.table({"id_a": pa.array(rows["id_a"], pa.int64()),
                         "id_b": pa.array(rows["id_b"], pa.int64()),
                         "jaccard": pa.array(rows["jaccard"], pa.float64())})

    # distinct-ify pairs found in multiple buckets, then verify
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per document from token crc32 features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(pc.fill_null(batch["text"], "").to_pylist()):
            toks = text.split()
            if not toks:
                continue
            h32 = np.fromiter((zlib.crc32(t.encode()) for t in toks), dtype=np.uint64,
                              count=len(toks))
            # widen to 64 bits deterministically
            h = h32 * np.uint64(0x9E3779B97F4A7C15)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            # signed: uint64 would wrap on negative scores and set every bit
            score = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
            sim = np.uint64(0)
            for b in np.nonzero(score > 0)[0]:
                sim |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sim.astype(np.int64))
        return batch.append_column("simhash", pa.array(out))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id"):
    """Near-dup pairs by SimHash: bucket on each of 4×16-bit chunks (pigeonhole
    guarantees Hamming ≤ 3 pairs share some chunk), verify distance in-bucket."""
    sig = ds.map_batches(SimHasher(), batch_format="pyarrow", batch_size=1024)

    def explode(t: pa.Table) -> pa.Table:
        ids, keys, sims = [], [], []
        for did, s in zip(t[id_col].to_pylist(), t["simhash"].to_pylist()):
            u = s & ((1 << 64) - 1)
            for c in range(4):
                chunk = (u >> (16 * c)) & 0xFFFF
                keys.append(f"{c}:{chunk:04x}")
                ids.append(did)
                sims.append(s)
        return pa.table({"chunk_key": pa.array(keys), id_col: pa.array(ids, pa.int64()),
                         "simhash": pa.array(sims, pa.int64())})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        rows = sorted(zip(g[id_col].to_pylist(), g["simhash"].to_pylist()))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                dist = hamming64(rows[i][1], rows[j][1])
                if dist <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(dist)
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(d, pa.int64())})

    pairs = sig.map_batches(
        lambda t: explode(t.select([id_col, "simhash"])), batch_format="pyarrow"
    ).groupby("chunk_key").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds, threshold: float = 0.3, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Pairs with cosine similarity ≥ threshold. The full matrix is broadcast
    once via ray.put and each batch does one float64 matmul against it — no
    shuffle. O(n²) flops: the honest baseline; bucket with LSH (similarity.py)
    when n² stops fitting."""
    import ray

    all_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in all_rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        bids, bmat = ray.get(ref)
        q_ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        sims = q @ bmat.T
        out_a, out_b, out_s = [], [], []
        for i in range(sims.shape[0]):
            hit = np.nonzero(sims[i] >= threshold)[0]
            for j in hit:
                if q_ids[i] < bids[j]:  # canonical (a<b), skips self-pairs
                    out_a.append(q_ids[i])
                    out_b.append(bids[j])
                    out_s.append(sims[i, j])
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    return ds.map_batches(block, batch_format="pyarrow", batch_size=256)
