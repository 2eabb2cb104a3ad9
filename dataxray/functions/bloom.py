"""Bloom-filter broadcast anti-join — the large-key-set complement to the
broadcast-set anti-join.

A plain broadcast anti-join ships the whole key SET to every task; at 10^9+
keys that is gigabytes per worker. A Bloom filter compresses the set to
~1.2 bytes/key at 1% false-positive rate, and false positives only cost
VERIFICATION, never correctness: rows the filter rejects are definitely not
in the set (kept immediately); rows it accepts (true members + ~fpr false
positives) go through an exact ``left_anti`` hash join against the key
table. Only that small positive slice shuffles — the join the filter exists
to avoid never sees the bulk of the stream.

Trade-off (documented): the positive/negative branches each re-execute the
upstream read (Ray Data has no multi-output operators), so the source is
scanned twice. Reads are cheap and column-pruned; the avoided full-stream
shuffle is the expensive part at scale.

Filter build is distributed: per-batch partial filters OR-reduce up a task
tree (no driver-side key loop). Vectorized double hashing (splitmix64) over
packed uint64 words.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Packed-uint64 Bloom filter over integer keys, fully vectorized."""

    def __init__(self, num_bits: int = 1 << 22, num_hashes: int = 7,
                 words: np.ndarray | None = None):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.k = num_hashes
        self.words = words if words is not None else np.zeros(num_bits // 64,
                                                              dtype=np.uint64)

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        u = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits))

    def add(self, keys: np.ndarray) -> None:
        idx = self._indices(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: True = maybe in set, False = definitely not."""
        idx = self._indices(np.asarray(keys))
        bits = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge_words(self, other: np.ndarray) -> None:
        np.bitwise_or(self.words, other, out=self.words)


def build_bloom(keys_ds, key_col: str, num_bits: int = 1 << 22,
                num_hashes: int = 7, fanin: int = 8) -> BloomFilter:
    """Distributed build: per-block partial filters OR-reduced up a tree."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits, num_hashes)
        bf.add(batch[key_col].combine_chunks().to_numpy(zero_copy_only=False))
        # one row per block: the packed words as a binary blob
        return pa.table({"words": pa.array([bf.words.tobytes()], pa.large_binary())})

    @ray.remote(num_cpus=1)
    def merge(*tables: pa.Table) -> pa.Table:
        acc = np.zeros(num_bits // 64, dtype=np.uint64)
        for t in tables:
            for blob in t["words"].to_pylist():
                np.bitwise_or(acc, np.frombuffer(blob, dtype=np.uint64), out=acc)
        return pa.table({"words": pa.array([acc.tobytes()], pa.large_binary())})

    refs = list(keys_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=65_536).to_arrow_refs())
    while len(refs) > 1:
        refs = [merge.remote(*refs[i:i + fanin]) for i in range(0, len(refs), fanin)]
    # OR every row of the final block: a single ref can hold SEVERAL
    # partial rows (one per upstream batch of a fused read) — reading only
    # row 0 would drop their bits and manufacture false negatives.
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    if refs:
        for blob in ray.get(refs[0])["words"].to_pylist():
            np.bitwise_or(words, np.frombuffer(blob, dtype=np.uint64),
                          out=words)
    return BloomFilter(num_bits, num_hashes, words=words)


def bloom_anti_join(left_ds, keys_ds, left_key: str, right_key: str,
                    num_bits: int = 1 << 22, num_hashes: int = 7,
                    join_partitions: int = 8):
    """EXACT anti join (left rows whose key is NOT in keys_ds), Bloom-
    prefiltered: definite negatives bypass the shuffle, positives verify via
    a left_anti hash join against the key table."""
    import ray

    bf = build_bloom(keys_ds, right_key, num_bits, num_hashes)
    bf_ref = ray.put(bf)

    def split(maybe: bool):
        def fn(batch: pa.Table) -> pa.Table:
            f: BloomFilter = ray.get(bf_ref)
            keys = batch[left_key].combine_chunks().to_numpy(zero_copy_only=False)
            mask = f.contains(keys)
            return batch.filter(pa.array(mask if maybe else ~mask))

        return fn

    negatives = left_ds.map_batches(split(False), batch_format="pyarrow")
    positives = left_ds.map_batches(split(True), batch_format="pyarrow")
    # distinct keys via C-speed tree aggregate, not a row-cardinality groupby
    from ..stages.hashagg import tree_distinct

    keys_only = tree_distinct(keys_ds.select_columns([right_key]), [right_key])
    verified = positives.join(keys_only, join_type="left_anti",
                              num_partitions=join_partitions,
                              on=(left_key,), right_on=(right_key,))
    return negatives.union(verified)
