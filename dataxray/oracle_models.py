"""Single-process reference models for queries DuckDB cannot express.

Each model recomputes a query's expected result with plain per-row Python /
numpy — no Ray, no Dataset, no shuffle — so the correctness harness
(tools/check_correctness.py) can hold the distributed pipelines to full
row/schema/value equality, the same way test_property_transforms.py checks
the dx_* transforms against per-row models. Deterministic by construction
(fixed seeds, no wall clock).

What each model validates: the *distributed composition* (banding, bucket
groupbys, caps, joins, per-batch partial top-k + global reduce, tie-breaks).
The innermost per-doc kernels (shingle hashing) are shared with the engine
where reimplementing them would just duplicate three lines of arithmetic;
the SimHash and fingerprint models are independent per-row reimplementations.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(sf_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# simhash_signatures — independent per-row reimplementation
# ---------------------------------------------------------------------------


def _simhash64_py(text: str) -> int:
    counts = [0] * 64
    toks = (text or "").split()
    for t in toks:
        h = (zlib.crc32(t.encode()) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    sim = 0
    for b in range(64):
        if counts[b] > 0:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim  # two's-complement int64


def simhash_signatures(sf_dir: str) -> pa.Table:
    t = _docs(sf_dir)
    sims = [_simhash64_py(v) for v in t["text"].to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(sims, pa.int64())})


# ---------------------------------------------------------------------------
# doc_fingerprints — independent per-row blake2b
# ---------------------------------------------------------------------------


def doc_fingerprints(sf_dir: str) -> pa.Table:
    t = _docs(sf_dir)
    fps = [int.from_bytes(hashlib.blake2b((v or "").encode(), digest_size=8)
                          .digest(), "big") >> 1
           for v in t["text"].to_pylist()]
    return pa.table({"doc_id": t["doc_id"], "fp64": pa.array(fps, pa.int64())})


# ---------------------------------------------------------------------------
# minhash_dedup — sequential recompute of the LSH composition
# ---------------------------------------------------------------------------


def minhash_dedup(sf_dir: str, num_perm: int = 64, num_bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.5,
                  max_bucket: int = 256) -> pa.Table:
    from .functions.dedup import MinHasher

    mh = MinHasher(num_perm, shingle_k)
    t = _docs(sf_dir)
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    shingle_sets = {i: set(mh.shingles(x or "").tolist()) for i, x in zip(ids, texts)}

    buckets: dict[str, list[int]] = {}
    rows_per_band = num_perm // num_bands
    for i, x in zip(ids, texts):
        sig = mh.signature(x or "")
        for b in range(num_bands):
            band = sig[b * rows_per_band: (b + 1) * rows_per_band]
            key = f"{b}:{zlib.crc32(band.tobytes()):08x}"
            buckets.setdefault(key, []).append(i)

    pairs = set()
    for members in buckets.values():
        members = sorted(members)[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))

    out = {"id_a": [], "id_b": [], "jaccard": []}
    for a, b in sorted(pairs):
        sa, sb = shingle_sets[a], shingle_sets[b]
        j = 1.0 if not sa and not sb else len(sa & sb) / max(len(sa | sb), 1)
        if j >= threshold:
            out["id_a"].append(a)
            out["id_b"].append(b)
            out["jaccard"].append(j)
    return pa.table({"id_a": pa.array(out["id_a"], pa.int64()),
                     "id_b": pa.array(out["id_b"], pa.int64()),
                     "jaccard": pa.array(out["jaccard"], pa.float64())})


# ---------------------------------------------------------------------------
# multimodal_features — independent WAV parse (struct chunk walk, not `wave`)
# ---------------------------------------------------------------------------


def _wav_decode_struct(b: bytes):
    """Minimal RIFF/WAVE parser: walk chunks with struct, no wave module."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            _fmt, nch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None or bits != 16 or nch != 1:
        return None
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return rate, len(samples), samples


def multimodal_features(sf_dir: str, n_windows: int = 8) -> pa.Table:
    from .functions.multimodal import synth_wav_bytes

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    cols = {"doc_id": [], "media_len": [], "sample_rate": [], "n_frames": [],
            "duration_ms": [], "rms": [], "peak": [], "feature": []}
    for did in t["doc_id"].to_pylist():
        b = synth_wav_bytes(int(did))
        rate, nf, samples = _wav_decode_struct(b)
        cols["doc_id"].append(did)
        cols["media_len"].append(len(b))
        cols["sample_rate"].append(rate)
        cols["n_frames"].append(nf)
        cols["duration_ms"].append(1000.0 * nf / rate)
        cols["rms"].append(float(np.sqrt(np.mean(samples * samples))))
        cols["peak"].append(float(np.max(np.abs(samples))))
        feat = np.zeros(n_windows, dtype=np.float32)
        bounds = np.linspace(0, len(samples), n_windows + 1, dtype=np.int64)
        for i in range(n_windows):
            seg = samples[bounds[i]:bounds[i + 1]]
            if len(seg):
                feat[i] = np.float32(np.sqrt(np.mean(seg * seg)))
        cols["feature"].append(feat.tolist())
    return pa.table({
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "media_len": pa.array(cols["media_len"], pa.int64()),
        "sample_rate": pa.array(cols["sample_rate"], pa.int64()),
        "n_frames": pa.array(cols["n_frames"], pa.int64()),
        "duration_ms": pa.array(cols["duration_ms"], pa.float64()),
        "rms": pa.array(cols["rms"], pa.float64()),
        "peak": pa.array(cols["peak"], pa.float64()),
        "feature": pa.array(cols["feature"], pa.list_(pa.float32())),
    })


# ---------------------------------------------------------------------------
# knn_ivf_top5 — numpy recompute of the IVF probe + exact in-list top-k
# ---------------------------------------------------------------------------


def knn_ivf_top5(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5,
                 num_lists: int = 16, nprobe: int = 4,
                 train_sample: int = 4096) -> pa.Table:
    from .functions.similarity import train_ivf

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    cents = train_ivf(mat[:train_sample], num_lists)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    lists = np.argmax(norm @ cents.T, axis=1)

    q_pos = {int(q): np.nonzero(ids == q)[0][0] for q in query_ids}
    sims_qc = norm[[q_pos[q] for q in sorted(q_pos)]] @ cents.T
    probe = min(nprobe, num_lists)
    probed = set(np.argpartition(-sims_qc, probe - 1, axis=1)[:, :probe]
                 .ravel().tolist())
    in_lists = np.isin(lists, sorted(probed))

    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid in sorted(q_pos):
        sims = norm[in_lists] @ norm[q_pos[qid]]
        cand = ids[in_lists]
        keep = cand != qid
        order = np.lexsort((cand[keep], -sims[keep]))[:k]
        for r, j in enumerate(order, start=1):
            out["query_id"].append(qid)
            out["neighbor_id"].append(int(cand[keep][j]))
            out["rank"].append(r)
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                     "rank": pa.array(out["rank"], pa.int64())})


# ---------------------------------------------------------------------------
# knn_lsh_top5 — numpy recompute of bucket-filtered exact cosine top-k
# ---------------------------------------------------------------------------


def knn_lsh_top5(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5,
                 num_planes: int = 8) -> pa.Table:
    from .functions.similarity import LshBuckets

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    lsh = LshBuckets(mat.shape[1], num_planes)
    buckets = lsh.bucket_of(mat)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)

    q_rows = {int(i): norm[np.nonzero(ids == i)[0][0]] for i in query_ids}
    q_buckets = {int(buckets[np.nonzero(ids == i)[0][0]]) for i in query_ids}
    in_bucket = np.isin(buckets, sorted(q_buckets))

    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid in sorted(q_rows):
        sims = norm[in_bucket] @ q_rows[qid]
        cand_ids = ids[in_bucket]
        keep = cand_ids != qid
        order = np.lexsort((cand_ids[keep], -sims[keep]))[:k]  # sim DESC, id ASC
        for r, j in enumerate(order, start=1):
            out["query_id"].append(qid)
            out["neighbor_id"].append(int(cand_ids[keep][j]))
            out["rank"].append(r)
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                     "rank": pa.array(out["rank"], pa.int64())})


# ---------------------------------------------------------------------------
# repetition_stats — independent per-row reimplementation (no shared code
# with functions.text beyond the published Gopher definitions)
# ---------------------------------------------------------------------------


def repetition_stats(sf_dir: str) -> pa.Table:
    t = _docs(sf_dir)
    rows = {"doc_id": [], "dup_line_frac": [], "dup_line_char_frac": [],
            "top2gram_char_frac": []}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        text = text or ""
        lines = [ln for ln in text.split("\n") if ln.strip()]
        dl = dlc = 0.0
        if lines:
            seen: dict[str, int] = {}
            for ln in lines:
                seen[ln] = seen.get(ln, 0) + 1
            dl = sum(c - 1 for c in seen.values()) / len(lines)
            tot = sum(len(ln) for ln in lines)
            dup = sum(len(ln) * (c - 1) for ln, c in seen.items())
            dlc = dup / tot if tot else 0.0
        toks = text.split()
        tg = 0.0
        if len(toks) >= 2:
            grams: dict[tuple, int] = {}
            for g in zip(toks, toks[1:]):
                grams[g] = grams.get(g, 0) + 1
            best = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
            (a, b), c = best
            total = sum(len(x) for x in toks)
            tg = min((len(a) + len(b)) * c / total, 1.0) if total else 0.0
        rows["doc_id"].append(did)
        rows["dup_line_frac"].append(dl)
        rows["dup_line_char_frac"].append(dlc)
        rows["top2gram_char_frac"].append(tg)
    return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                     "dup_line_frac": pa.array(rows["dup_line_frac"]),
                     "dup_line_char_frac": pa.array(rows["dup_line_char_frac"]),
                     "top2gram_char_frac": pa.array(rows["top2gram_char_frac"])})


# ---------------------------------------------------------------------------
# pack_bins — single-process next-fit packing over the same hash buckets
# ---------------------------------------------------------------------------


def pack_bins(sf_dir: str, max_tokens: int = 256,
              num_buckets: int = 16) -> pa.Table:
    t = _docs(sf_dir)
    per_bucket: dict[int, list[tuple[int, int]]] = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").strip()
        n = len(toks.split()) if toks else 0
        h = (did * 0x9E3779B97F4A7C15 & ((1 << 64) - 1)) >> 33
        per_bucket.setdefault(h % num_buckets, []).append((did, n))
    rows = {"doc_id": [], "n_tokens": [], "bin_id": []}
    for b in sorted(per_bucket):
        k = used = 0
        for did, n in sorted(per_bucket[b]):
            if used > 0 and used + n > max_tokens:
                k += 1
                used = 0
            rows["doc_id"].append(did)
            rows["n_tokens"].append(n)
            rows["bin_id"].append((b << 32) | k)
            used += n
            if used >= max_tokens:
                k += 1
                used = 0
    return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                     "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
                     "bin_id": pa.array(rows["bin_id"], pa.int64())})


# ---------------------------------------------------------------------------
# image_resize — independent pixel-level reimplementation (synth + parse +
# center-aligned nearest-neighbor + P6 re-encode + md5)
# ---------------------------------------------------------------------------


def image_resize(sf_dir: str, out_w: int = 4, out_h: int = 3,
                 w: int = 16, h: int = 12) -> pa.Table:
    import hashlib

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    rows = {"doc_id": [], "decoded_ok": [], "resized_md5": []}
    for did in t["doc_id"].to_pylist():
        key = int(did)
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 255 // max(w - 1, 1) + key) % 256
        g = (yy * 255 // max(h - 1, 1) + key * 3) % 256
        b = (xx + yy + key * 7) % 256
        img = np.stack([r, g, b], axis=-1).astype(np.uint8)
        xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(int),
                        w - 1)
        yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(int),
                        h - 1)
        small = img[yi][:, xi]
        enc = (f"P6\n{out_w} {out_h}\n255\n".encode() + small.tobytes())
        rows["doc_id"].append(key)
        rows["decoded_ok"].append(True)
        rows["resized_md5"].append(hashlib.md5(enc).hexdigest())
    return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                     "decoded_ok": pa.array(rows["decoded_ok"], pa.bool_()),
                     "resized_md5": pa.array(rows["resized_md5"], pa.string())})


# ---------------------------------------------------------------------------
# hll_distinct_users — independent pure-Python HLL (per-row int arithmetic;
# no numpy hashing shared with the engine kernel)
# ---------------------------------------------------------------------------


def _splitmix64_py(x: int) -> int:
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def hll_distinct_users(sf_dir: str, p: int = 12) -> pa.Table:
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["user_id"])
    m = 1 << p
    regs = [0] * m
    mask = (1 << 64) - 1
    for v in t["user_id"].to_pylist():
        h = _splitmix64_py(int(v))
        b = h >> (64 - p)
        suffix = (h << p) & mask
        lz = 64 - suffix.bit_length()
        rank = min(lz, 64 - p) + 1
        if rank > regs[b]:
            regs[b] = rank
    alpha = 0.7213 / (1 + 1.079 / m)
    denom = sum(1 << (64 - r) for r in regs)
    est = alpha * m * m * 2.0 ** 64 / float(denom)
    if est <= 2.5 * m:
        zeros = regs.count(0)
        if zeros:
            est = m * float(np.log(m / zeros))
    return pa.table({"column": pa.array(["user_id"]),
                     "hll_estimate": pa.array([int(round(est))], pa.int64())})


def cms_user_counts(sf_dir: str, depth: int = 4, width: int = 2048) -> pa.Table:
    """Independent pure-Python count-min: per-row dict updates, then min
    over rows — no numpy hashing shared with the engine kernel."""
    seeds = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["user_id"])
    rows = [dict() for _ in range(depth)]
    for v in t["user_id"].to_pylist():
        for d in range(depth):
            b = _splitmix64_py(int(v) ^ seeds[d]) % width
            rows[d][b] = rows[d].get(b, 0) + 1
    out_ids, out_est = [], []
    for q in range(20):
        est = min(rows[d].get(_splitmix64_py(q ^ seeds[d]) % width, 0)
                  for d in range(depth))
        out_ids.append(q)
        out_est.append(est)
    return pa.table({"user_id": pa.array(out_ids, pa.int64()),
                     "est_count": pa.array(out_est, pa.int64())})


def hll_distinct_users_by_type(sf_dir: str, p: int = 12) -> pa.Table:
    """Independent grouped HLL: per-type pure-Python registers."""
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_type", "user_id"])
    m = 1 << p
    mask = (1 << 64) - 1
    groups: dict = {}
    for et, v in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        regs = groups.setdefault(et, [0] * m)
        h = _splitmix64_py(int(v))
        b = h >> (64 - p)
        suffix = (h << p) & mask
        rank = min(64 - suffix.bit_length(), 64 - p) + 1
        if rank > regs[b]:
            regs[b] = rank
    alpha = 0.7213 / (1 + 1.079 / m)
    out_t, out_e = [], []
    for et in sorted(groups):
        regs = groups[et]
        denom = sum(1 << (64 - r) for r in regs)
        est = alpha * m * m * 2.0 ** 64 / float(denom)
        if est <= 2.5 * m:
            zeros = regs.count(0)
            if zeros:
                est = m * float(np.log(m / zeros))
        out_t.append(et)
        out_e.append(int(round(est)))
    return pa.table({"event_type": pa.array(out_t, pa.string()),
                     "hll_users": pa.array(out_e, pa.int64())})


def pagerank_users(sf_dir: str, iters: int = 10,
                   damping: float = 0.85) -> pa.Table:
    """Single-process PageRank reference: same graph lift (user_id →
    10^6 + value_cents % 1000), same damped power iteration with uniform
    dangling redistribution, in plain numpy."""
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id", "value"])
    u = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vc = np.round(ev["value"].to_numpy(zero_copy_only=False) * 100) \
        .astype(np.int64)
    v = 1000000 + (vc % 1000)
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
        r = (1 - damping) / n + damping * (inflow + dangling / n)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(r, pa.float64())})


def _det_sqdist(m, c):
    """Row-count-independent squared L2 (mirrors the engine's helper: BLAS
    gemm tiling varies with matrix shape; per-centroid elementwise sums
    over the fixed dim are layout-stable)."""
    out = np.empty((m.shape[0], c.shape[0]), dtype=np.float64)
    for j in range(c.shape[0]):
        d = m - c[j]
        out[:, j] = (d * d).sum(axis=1)
    return out


def kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 5,
                    quant_bits: int = 20) -> pa.Table:
    """Single-process mirror of kmeans_fit_assign: same seed-by-smallest-
    ids init, same fixed-point int64 centroid accumulation (order-free),
    same squared-L2 argmin with lowest-index tie-break."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])
    order = np.argsort(ids, kind="stable")
    scale = float(1 << quant_bits)
    cent = m[order[:k]].copy()
    for _ in range(iters):
        d2 = _det_sqdist(m, cent)
        a = np.argmin(d2, axis=1)
        q = np.rint(m * scale).astype(np.int64)
        sums = np.zeros((k, m.shape[1]), dtype=np.int64)
        np.add.at(sums, a, q)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        nz = cnt > 0
        cent[nz] = sums[nz] / (cnt[nz, None] * scale)
    d2 = _det_sqdist(m, cent)
    a = np.argmin(d2, axis=1)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(a.astype(np.int64))})


def video_frame_sample(sf_dir: str, num_samples: int = 4,
                       w: int = 16, h: int = 12,
                       n_frames: int = 24) -> pa.Table:
    """Independent frame-sampling reference: regenerate each synthetic
    frame directly from the generator formula (no container parse) and
    compute the same exact mean luma."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = sorted(i for i in t["doc_id"].to_pylist() if i < 50)
    out = {"doc_id": [], "frame_idx": [], "width": [], "height": [],
           "mean_luma": []}
    picks = sorted({i * n_frames // num_samples for i in range(num_samples)})
    yy, xx = np.mgrid[0:h, 0:w]
    for did in ids:
        for f in picks:
            key = did * 31 + f
            r = (xx * 255 // max(w - 1, 1) + key) % 256
            g = (yy * 255 // max(h - 1, 1) + key * 3) % 256
            b = (xx + yy + key * 7) % 256
            s = [int(r.sum()), int(g.sum()), int(b.sum())]
            lum = (299 * s[0] + 587 * s[1] + 114 * s[2]) / (1000.0 * w * h)
            out["doc_id"].append(did)
            out["frame_idx"].append(f)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_luma"].append(lum)
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "frame_idx": pa.array(out["frame_idx"], pa.int64()),
        "width": pa.array(out["width"], pa.int64()),
        "height": pa.array(out["height"], pa.int64()),
        "mean_luma": pa.array(out["mean_luma"], pa.float64()),
    })


def bfs_hops_from_hub(sf_dir: str, source: int = 1000000) -> pa.Table:
    """Single-process BFS reference over the same graph lift."""
    from collections import deque

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["user_id", "value"])
    u = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vc = np.round(ev["value"].to_numpy(zero_copy_only=False) * 100) \
        .astype(np.int64)
    v = 1000000 + (vc % 1000)
    adj: dict[int, set] = {}
    for a, b in zip(u.tolist(), v.tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {source: 0} if source in adj else {}
    q = deque(dist)
    while q:
        n = q.popleft()
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    nodes = sorted(dist)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "dist": pa.array([dist[n] for n in nodes], pa.int64())})
