"""Distributed sketches & deterministic sampling primitives.

Everything here is built for oracle-exact verification: the shared hash is
splitmix64 (public domain, Steele et al., "Fast splittable pseudorandom
number generators", OOPSLA'14), vectorized in numpy for the hot path AND
emitted as a DuckDB SQL expression (``splitmix64_sql``) so the driver's
SQL oracle reproduces every sampled row / every HLL register bit-exactly.

Scale notes per primitive:
- HLL: per-block partial registers (2^p bytes each) merge by elementwise
  max — associative/commutative, so the reduce is a tiny tree over
  O(blocks) registers, never the raw values. 100 TB of rows reduce to
  blocks × 4 KiB of metadata.
- sample_hash: stateless per-batch filter, no shuffle at all.
- stratified_sample: per-block partial top-k per stratum (bounds the
  shuffle to ≤ k·strata rows per block) before the per-stratum final —
  the same combine-before-shuffle shape as the aggregates.

Reference analog: the DataX reference has no sketch/sampling operators;
these are the §2.4 "missing-by-design" additions a training-data pipeline
needs (sizing corpora, reservoir-free deterministic subsets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
M64 = 1 << 64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over int64/uint64 arrays."""
    with np.errstate(over="ignore"):
        z = x.astype(_U64, copy=True) + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _mulmod_sql(a: str, c: int) -> str:
    """(a * c) mod 2^64 in DuckDB HUGEINT via 32-bit limb decomposition —
    a direct HUGEINT multiply of two 64-bit operands overflows INT128."""
    c_lo, c_hi = c % (1 << 32), c >> 32
    return (f"((({a}) % 4294967296) * {c_lo} + "
            f"(((({a}) % 4294967296) * {c_hi} + "
            f"(({a}) // 4294967296) * {c_lo}) % 4294967296) * 4294967296) "
            f"% {M64}")


def splitmix64_sql(x: str) -> str:
    """DuckDB SQL expression computing splitmix64(x) bit-identically to the
    numpy kernel (x a non-negative BIGINT expression). Parity is pytest-
    locked over random inputs. xor/floor-div emulate ^ / >> on the
    non-negative HUGEINT domain."""
    z1 = f"((CAST({x} AS HUGEINT) + 11400714819323198485) % {M64})"
    z2 = _mulmod_sql(f"xor({z1}, {z1} // 1073741824)", 0xBF58476D1CE4E5B9)
    z3 = _mulmod_sql(f"xor(({z2}), ({z2}) // 134217728)", 0x94D049BB133111EB)
    return f"xor(({z3}), ({z3}) // 2147483648)"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_partial_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """One block's HLL registers: bucket = top p bits, rank = 1 + leading
    zeros of the remaining 64-p bits (capped at 64-p+1). Vectorized: the
    rank is 64-p+1 minus the bit length of the suffix."""
    m = 1 << p
    h = hashes.astype(_U64, copy=False)
    bucket = (h >> _U64(64 - p)).astype(np.int64)
    suffix = h << _U64(p)  # remaining bits, left-aligned in 64
    # leading zeros of suffix within 64 bits; all-zero suffix -> 64
    # bit_length via float64 log2 is unsafe near 2^53; use np.frexp on
    # the high 32 bits then low 32 bits instead
    hi = (suffix >> _U64(32)).astype(np.uint32)
    lo = (suffix & _U64(0xFFFFFFFF)).astype(np.uint32)
    # number of leading zeros in a uint32 via bit_length of value
    def _lz32(v: np.ndarray) -> np.ndarray:
        # frexp exponent of v gives bit_length for v>0 exactly (v < 2^32
        # is exactly representable in float64)
        _, e = np.frexp(v.astype(np.float64))
        return np.where(v == 0, 32, 32 - e).astype(np.int64)

    lz = np.where(hi != 0, _lz32(hi), 32 + _lz32(lo))
    rank = np.minimum(lz, 64 - p) + 1
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Classic Flajolet HLL estimator with the standard small-range
    (linear counting) and large-range corrections. The harmonic
    denominator Σ2^-r is accumulated as the EXACT integer Σ2^(64-r)
    (register values are ≤64), so the estimate is bit-identical in any
    summation order / any engine — float rounding happens exactly once."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    counts = np.bincount(regs, minlength=65).tolist()
    denom = sum(c << (64 - r) for r, c in enumerate(counts) if c)
    est = alpha * m * m * 2.0 ** 64 / float(denom)
    if est <= 2.5 * m:
        zeros = counts[0]
        if zeros:
            return m * np.log(m / zeros)
    if est > (1 / 30) * M64:
        return -M64 * np.log1p(-est / M64)
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) for an int64 column: per-block
    partial registers (4 KiB each at p=12), elementwise-max reduce over
    the partials. The reduce input is metadata-sized — O(blocks)×2^p
    bytes — so a driver-side max is honest at any data scale; swap in a
    tree map_batches stage if blocks ever outgrow driver memory."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        regs = hll_partial_registers(splitmix64(vals), p)
        return pa.table({"regs": pa.array([regs.tolist()],
                                          pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    regs = np.zeros(1 << p, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for r in b["regs"].to_pylist():
            np.maximum(regs, np.asarray(r, dtype=np.int64), out=regs)
    return int(round(hll_estimate(regs)))


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def sample_hash(ds, key_col: str, frac: float):
    """Deterministic Bernoulli(frac) sample: keep rows whose
    splitmix64(key) < frac·2^64. Stateless per-batch filter (no shuffle,
    no RNG state), reproducible by the SQL oracle via splitmix64_sql."""
    threshold = _U64(min(int(frac * M64), M64 - 1))

    def flt(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(splitmix64(keys) < threshold))

    return ds.map_batches(flt, batch_format="pyarrow")


def sample_threshold_sql(key_expr: str, frac: float) -> str:
    """The matching oracle predicate for sample_hash."""
    return f"{splitmix64_sql(key_expr)} < {min(int(frac * M64), M64 - 1)}"


def stratified_sample(ds, stratum_col: str, key_col: str, n_per_stratum: int):
    """Deterministic n-per-stratum sample: the n rows with the smallest
    (splitmix64(key), key) per stratum — a uniform random subset under the
    hash, stable across runs/engines. Per-block partial top-n bounds the
    shuffle to ≤ n rows per (block, stratum); the per-stratum final picks
    the global smallest n. Ties are impossible modulo 64-bit hash
    collisions, with key as the documented tiebreak."""

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        # sort on a shifted int64 image of the uint64 hash: preserves
        # uint64 order while keeping Arrow's native int64 sort downstream
        img = (splitmix64(keys) - _U64(1 << 63)).astype(np.int64)
        t = t.append_column("_h", pa.array(img))
        codes = pc.dictionary_encode(t[stratum_col].combine_chunks()) \
            .indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, img, codes))  # by stratum, then (h, key)
        sorted_codes = codes[order]
        # within-stratum rank = position minus the stratum's start offset
        starts = np.flatnonzero(np.r_[True, np.diff(sorted_codes) != 0])
        sizes = np.diff(np.r_[starts, len(order)])
        rank = np.arange(len(order)) - np.repeat(starts, sizes)
        keep = order[rank < n_per_stratum]
        return t.take(pa.array(np.sort(keep)))

    def final(g: pa.Table) -> pa.Table:
        g = g.sort_by([("_h", "ascending"), (key_col, "ascending")])
        return g.slice(0, n_per_stratum).drop_columns(["_h"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(stratum_col).map_groups(final, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Exact grouped quantiles (quantile_disc semantics)
# ---------------------------------------------------------------------------


def quantile_disc(sorted_vals: np.ndarray, q: float):
    """DuckDB quantile_disc: the element at index ceil(q·n)-1 of the
    sorted values (empirically locked by pytest parity sweep). Discrete
    quantiles return an actual data element, so the oracle comparison is
    bit-exact — no interpolation ulps."""
    n = len(sorted_vals)
    idx = max(int(np.ceil(q * n)) - 1, 0)
    return sorted_vals[min(idx, n - 1)]


def grouped_quantiles(ds, key_col: str, val_col: str, qs: dict[str, float]):
    """Exact per-group discrete quantiles via one per-key shuffle of the
    (key, value) projection only. Per-group memory is O(group rows) — the
    documented partitioning assumption; for heavy groups switch to the
    two-pass histogram refinement this module would grow next."""

    def agg(g: pa.Table) -> pa.Table:
        vals = np.sort(g[val_col].combine_chunks().to_numpy(
            zero_copy_only=False))
        out = {key_col: pa.array([g[key_col][0].as_py()])}
        for name, q in qs.items():
            out[name] = pa.array([quantile_disc(vals, q).item()])
        out["n_rows"] = pa.array([len(vals)], pa.int64())
        return pa.table(out)

    proj = ds.select_columns([key_col, val_col])
    return proj.groupby(key_col).map_groups(agg, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch (heavy-hitter counts)
# ---------------------------------------------------------------------------

CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)


def cms_partial(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """One block's count-min counters: depth independent splitmix64 hash
    rows (key xor per-row seed), width buckets each. Integer adds are
    commutative/associative, so partials merge by elementwise sum in any
    order — bit-exact in any engine."""
    k = keys.astype(_U64, copy=False)
    counts = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        idx = (splitmix64(k ^ _U64(CMS_SEEDS[d % len(CMS_SEEDS)]))
               % _U64(width)).astype(np.int64)
        np.add.at(counts[d], idx, 1)
    return counts


def cms_query(counts: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates: min over depth rows (classic CM upper bound)."""
    k = keys.astype(_U64, copy=False)
    depth, width = counts.shape
    est = np.full(len(k), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = (splitmix64(k ^ _U64(CMS_SEEDS[d % len(CMS_SEEDS)]))
               % _U64(width)).astype(np.int64)
        np.minimum(est, counts[d, idx], out=est)
    return est


def cms_counts(ds, col: str, query_keys: np.ndarray,
               depth: int = 4, width: int = 2048) -> np.ndarray:
    """Distributed CM sketch build + point query: per-block partial
    counters (depth×width int64 ≈ 64 KiB at the defaults), summed — the
    reduce input is metadata-sized, like the HLL registers."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        c = cms_partial(vals, depth, width)
        return pa.table({"c": pa.array([c.ravel().tolist()],
                                       pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    total = np.zeros(depth * width, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for r in b["c"].to_pylist():
            total += np.asarray(r, dtype=np.int64)
    return cms_query(total.reshape(depth, width), query_keys)


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------


def _kmv_bottom_k(t: pa.Table, group_col: str, k: int) -> pa.Table:
    """Distinct (group, h) rows truncated to the k SMALLEST h per group.
    Pure set-function of the input rows (dedup + per-group bottom-k), so
    applying it at every tree level is associative/commutative/idempotent."""
    import pyarrow.compute as pc

    if len(t) == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         "h": pa.array([], pa.uint64())})
    t = t.group_by([group_col, "h"]).aggregate([])  # distinct
    t = t.sort_by([(group_col, "ascending"), ("h", "ascending")])
    g = t[group_col].combine_chunks()
    codes = pc.dictionary_encode(g).indices.to_numpy(zero_copy_only=False)
    # rank within group over the sorted layout: position − first position
    _, first = np.unique(codes, return_index=True)
    rank = np.arange(len(t)) - first[codes]
    return t.filter(pa.array(rank < k))


def kmv_by_group(ds, group_col: str, key_col: str, k: int = 64,
                 fanin: int = 8) -> pa.Table:
    """Per-group KMV sketch: THE k smallest distinct splitmix64(key) values
    (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07). Returns a driver-side
    table (group, h uint64) with ≤ k rows per group.

    Mergeable and layout-independent: set-union then bottom-k is the same
    whatever the block/tree shape, so the result is a pure function of the
    per-group key SETS — the SQL oracle reproduces it row-exactly via
    splitmix64_sql + row_number. Every tree level holds ≤ k rows per group
    (groups × k × 16 bytes), so 10^10 keys reduce through metadata-sized
    blocks; estimates and sketch set-ops (union / intersection / Jaccard)
    then run driver-side on the tiny final table."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = pa.table({group_col: t[group_col],
                       "h": pa.array(splitmix64(keys), pa.uint64())})
        return _kmv_bottom_k(tb, group_col, k)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    refs = list(parts.to_arrow_refs())

    @ray.remote(num_cpus=1)
    def merge(*ts):
        ts = [t for t in ts if t is not None and len(t)]
        if not ts:
            return _kmv_bottom_k(pa.table({}), group_col, k)
        return _kmv_bottom_k(
            pa.concat_tables(ts, promote_options="permissive"), group_col, k)

    if len(refs) == 1:
        refs = [merge.remote(refs[0])]  # fused reads: always combine once
    while len(refs) > 1:
        refs = [merge.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    return ray.get(refs[0]) if refs else _kmv_bottom_k(
        pa.table({}), group_col, k)


def kmv_estimate(n_k: int, kth_h: int, k: int) -> float:
    """Distinct-count estimate from a bottom-k sketch: exact below k,
    else (k−1) / θ with θ = kth_h / 2^64 (Beyer et al. unbiased form).
    kth_h→DOUBLE rounds identically in numpy and DuckDB (IEEE nearest),
    so the oracle matches bit-for-bit."""
    if n_k < k:
        return float(n_k)
    return (k - 1) / (np.uint64(kth_h).astype(np.float64) / float(M64))
