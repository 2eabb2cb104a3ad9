"""Url-hash partition / salt assignment — the engine's single wide shuffle key.

The reference splits *input* by key ranges (SingleTableSplitUtil.java:34-130)
and delegates keyed merge to the destination DB (WriterUtil.java:110-167).
Our engine owns the merge, so it must own the partitioning: ``_part =
hash(url) % P`` routes every event for a url to exactly one partition group,
which restores per-key total order (the analog of otsstreamreader's
parent-shard-before-child ordering, ShardStatusChecker.java:36-73).

Hot-key (Zipf url) mitigation: a salted two-stage merge. Stage A groups by
``(_part, _salt)`` with ``_salt = txn_id % S`` — LWW is an associative
max-by-(txn_id, seq) reduction, so per-salt partial winners are correct
inputs to a final per-partition reduce (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import partition_of
from ..schema import PART_COL, SALT_COL


class AssignPartition:
    """map_batches callable: append _part (and optionally _salt) columns."""

    def __init__(self, num_partitions: int, num_salts: int = 0, key: str = "url"):
        self.num_partitions = num_partitions
        self.num_salts = num_salts
        self.key = key

    def __call__(self, batch: pa.Table) -> pa.Table:
        part = partition_of(batch[self.key], self.num_partitions)
        batch = batch.append_column(PART_COL, pa.array(part))
        if self.num_salts > 1:
            # composite (part, salt) key in one int32 column: a single-column
            # groupby suffices for the stage-A salted reduce
            txn = batch["txn_id"].combine_chunks().to_numpy(zero_copy_only=False)
            salt = part * self.num_salts + (txn % self.num_salts).astype(np.int32)
            batch = batch.append_column(SALT_COL, pa.array(salt))
        return batch
