"""Bloom filter + Bloom-prefiltered exact anti-join."""

import numpy as np
import pyarrow as pa
import ray.data

from dataxray.functions.bloom import BloomFilter, bloom_anti_join, build_bloom


def test_bloom_no_false_negatives_and_low_fpr():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 1 << 40, size=20_000, dtype=np.int64)
    others = rng.integers(1 << 41, 1 << 42, size=20_000, dtype=np.int64)
    bf = BloomFilter(num_bits=1 << 19, num_hashes=7)  # ~26 bits/key
    bf.add(members)
    assert bf.contains(members).all()  # never a false negative
    fpr = bf.contains(others).mean()
    assert fpr < 0.01, f"false-positive rate {fpr:.4f} too high"


def test_distributed_build_equals_local():
    keys = np.arange(0, 50_000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    bf_dist = build_bloom(ds, "k", num_bits=1 << 18)
    bf_local = BloomFilter(num_bits=1 << 18)
    bf_local.add(keys)
    assert np.array_equal(bf_dist.words, bf_local.words)


def test_bloom_anti_join_exact():
    """Result must be EXACT despite false positives: equal to the set-based
    anti join on the same data."""
    rng = np.random.default_rng(7)
    left_keys = rng.integers(0, 5_000, size=8_000, dtype=np.int64)
    right_keys = rng.integers(2_500, 7_500, size=6_000, dtype=np.int64)
    left = ray.data.from_arrow(pa.table({
        "k": left_keys, "payload": [f"v{i}" for i in range(len(left_keys))]}))
    right = ray.data.from_arrow(pa.table({"rk": right_keys}))

    out = bloom_anti_join(left, right, "k", "rk",
                          num_bits=1 << 14)  # small filter → real FPs to verify
    got = sorted((r["k"], r["payload"]) for r in out.take_all())
    rset = set(right_keys.tolist())
    want = sorted((int(k), f"v{i}") for i, k in enumerate(left_keys)
                  if int(k) not in rset)
    assert got == want


def test_build_bloom_single_block_multi_rowgroup(ray_session, tmp_path):
    """Regression: a fused parquet read can leave SEVERAL per-batch partial
    bloom rows in one output block; the final read must OR every row, not
    just row 0 (dropping rows manufactures false negatives)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from dataxray.functions.bloom import build_bloom

    keys = np.arange(200_000, dtype=np.int64)
    path = str(tmp_path / "keys.parquet")
    pq.write_table(pa.table({"k": keys}), path, row_group_size=10_000)
    ds = ray.data.read_parquet(path, override_num_blocks=1)
    bf = build_bloom(ds, "k")
    assert bool(bf.contains(keys).all()), "bloom filter lost partial rows"
