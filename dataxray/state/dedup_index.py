"""Persistent MinHash/LSH sidecar index for INCREMENTAL near-dup detection.

The full pipeline (functions.dedup.minhash_dedup_pairs) re-shingles and
re-hashes the whole corpus per invocation — right for one-shot jobs, wrong
for an incremental-ingest engine where each epoch adds a sliver of docs.
This sidecar stores every indexed doc's LSH band memberships so an epoch's
cost is O(new docs): new docs are shingled once, their band keys probe the
stored buckets, and verification re-tokenizes only candidate docs (old docs
are NEVER re-shingled).

Reference analog: the stream reader's persisted checkpoint/status table
(otsstreamreader/.../OTSStreamReaderMasterProxy.java init:28-63) — durable
state that lets the next increment start where the last one stopped.

Layout (over state.lakefs — local paths and mocks3://-style object roots
both work; workers reconstruct the backend from the root string):
    root/
      _meta.json              config + per-epoch committed file lists
      bands/bucket=BBBB/e<label>-<uuid>.parquet   (band_key utf8, doc_id i64)

Band rows are hash-bucketed by crc32(band_key) % num_buckets, so a probe
reads ONLY the bucket dirs a new band key lands in — file-level pruning
that keeps probe I/O proportional to the epoch, not the index. The commit
point is the _meta.json epoch entry (manifest pattern, state.manifest):
files not listed there are invisible to probes, so a crashed ingest leaves
garbage, not corruption, and re-ingesting a committed label is a no-op.

Equality contract: the union of per-epoch pair sets equals the one-shot
minhash_dedup_pairs output whenever no LSH bucket exceeds ``max_bucket``
(the skew cap truncates per-view memberships, which can differ between the
incremental and one-shot views of a degenerate bucket).
"""

from __future__ import annotations

import os
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import lakefs

META = "_meta.json"
BANDS = "bands"


def _bucket_of(keys: pa.Array, num_buckets: int) -> pa.Array:
    vals = np.fromiter((zlib.crc32(k.encode()) for k in keys.to_pylist()),
                       dtype=np.uint64, count=len(keys))
    return pa.array((vals % np.uint64(num_buckets)).astype(np.int64))


class MinHashIndex:
    def __init__(self, root: str):
        self.root = root
        self.fs, self.base = lakefs.resolve(root)

    def _p(self, *parts: str) -> str:
        return os.path.join(self.base, *parts)

    # ---------- lifecycle ----------
    def exists(self) -> bool:
        return self.fs.exists(self._p(META))

    def create(self, num_perm: int = 64, num_bands: int = 16,
               shingle_k: int = 3, num_buckets: int = 64) -> "MinHashIndex":
        if self.exists():
            raise RuntimeError(f"index already exists at {self.root}")
        self.fs.makedirs(self._p(BANDS))
        self.fs.put_json(self._p(META), {
            "num_perm": num_perm, "num_bands": num_bands,
            "shingle_k": shingle_k, "num_buckets": num_buckets,
            "epochs": {},
        })
        return self

    def meta(self) -> dict:
        return self.fs.read_json(self._p(META))

    def indexed_rows(self) -> int:
        return sum(e["rows"] for e in self.meta()["epochs"].values())

    # ---------- source-version sync (sidecar-atomicity substitute) ----------
    # The index and the lake it derives from commit in DIFFERENT stores, so
    # a crash between a lake commit and the matching ingest cannot be made
    # atomic — instead every epoch RECORDS the source version token it was
    # built against (Lake.version_token() / ivf_index.table_version()), and
    # meta carries the latest. A consumer checks sync_status()/require_synced
    # before trusting the index; healing is just ingesting the missed docs
    # (ingest is itself crash-atomic: its _meta PUT is the commit point, so
    # a torn ingest leaves unlisted garbage files, never a corrupt index).

    def indexed_version(self) -> str | None:
        return self.meta().get("indexed_version")

    def sync_status(self, expected_version: str) -> dict:
        got = self.indexed_version()
        return {"indexed_version": got, "expected_version": expected_version,
                "in_sync": got == expected_version}

    def require_synced(self, expected_version: str) -> None:
        s = self.sync_status(expected_version)
        if not s["in_sync"]:
            raise RuntimeError(
                f"MinHash index at {self.root} was built against source "
                f"version {s['indexed_version']!r} but the source is now "
                f"{expected_version!r} — ingest the missed documents (or "
                "rebuild) before querying")

    def _live_files(self, buckets: set[int] | None = None) -> list[str]:
        """Committed band files, pruned to the touched buckets."""
        out = []
        for e in self.meta()["epochs"].values():
            for f in e["files"]:
                if buckets is None or f["bucket"] in buckets:
                    out.append(self._p(f["path"]))
        return out

    # ---------- ingest ----------
    def ingest(self, new_ds, corpus_ds, id_col: str = "doc_id",
               threshold: float = 0.7, label: str | None = None,
               max_bucket: int = 256, join_partitions: int = 8,
               source_version: str | None = None):
        """Index ``new_ds`` docs and return the VERIFIED near-dup pairs that
        involve at least one new doc (new×new ∪ new×indexed). ``corpus_ds``
        must contain the text of both new and already-indexed docs (the lake
        snapshot / documents table) — it is only read at candidate ids.

        Re-ingesting a committed ``label`` is a recognized replay: no index
        mutation, empty pair result (the epoch's pairs were already
        delivered — same label semantics as the lake commit)."""
        import ray
        import ray.data

        from ..functions.dedup import (MinHasher, candidate_pairs_from_bucket,
                                       explode_bands, multi_member_buckets,
                                       pairs_from_buckets, verify_pairs_jaccard)

        meta = self.meta()
        if label is None:
            label = f"e{len(meta['epochs']):04d}"
        if label in meta["epochs"]:
            return ray.data.from_arrow(pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}))
        num_bands, num_buckets = meta["num_bands"], meta["num_buckets"]

        # 1. shingle+minhash ONLY the new docs; band-explode; bucket
        sig = new_ds.map_batches(MinHasher(meta["num_perm"], meta["shingle_k"]),
                                 batch_format="pyarrow", batch_size=1024)
        new_bands = sig.map_batches(
            lambda t: explode_bands(t.select([id_col, "minhash"]),
                                    num_bands, id_col),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.append_column(
                "bucket", _bucket_of(t["band_key"].combine_chunks(),
                                     num_buckets)),
            batch_format="pyarrow",
        )
        # consumed 3×: probe keys, pair expansion, index write; staged to
        # parquet instead of plasma above DATAXRAY_STAGE_BUDGET_BYTES
        from ..stages.persist import persist_multi_pass

        new_bands = persist_multi_pass(new_bands, label="new-bands")

        new_tbl = pa.concat_tables(ray.get(new_bands.to_arrow_refs()))
        if len(new_tbl) == 0:  # empty epoch: commit the label, no pairs
            meta = self.meta()
            meta["epochs"][label] = {"rows": 0, "files": [],
                                     "source_version": source_version}
            if source_version is not None:
                meta["indexed_version"] = source_version
            self.fs.put_json(self._p(META), meta)
            return ray.data.from_arrow(pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}))
        new_keys = pc.unique(new_tbl["band_key"].combine_chunks())
        new_ids = pc.unique(pc.cast(new_tbl[id_col].combine_chunks(),
                                    pa.int64()))
        touched = set(pc.unique(new_tbl["bucket"].combine_chunks()).to_pylist())

        # 2. probe: read ONLY touched bucket files, keep rows matching a new
        # band key (the only rows that can pair with a new doc)
        probe_files = self._live_files(touched)
        pieces = [new_bands.select_columns(["band_key", id_col])]
        if probe_files:
            keys_ref = ray.put(new_keys)
            kwargs = {}
            if self.fs.pafs is not None:
                kwargs["filesystem"] = self.fs.pafs
            stored = ray.data.read_parquet(probe_files,
                                           columns=["band_key", id_col],
                                           **kwargs)
            stored = stored.map_batches(
                lambda t: t.filter(pc.is_in(t["band_key"],
                                            value_set=ray.get(keys_ref))),
                batch_format="pyarrow",
            )
            pieces.append(stored)
        combined = pieces[0] if len(pieces) == 1 else pieces[0].union(pieces[1])

        # 3. pair expansion over pair-producing buckets (same machinery as
        # the one-shot pipeline), then drop indexed×indexed pairs — they
        # were delivered by the epoch that introduced them
        from ..functions.dedup import check_bucket_caps

        hot, hot_rows, sizes = multi_member_buckets(combined, "band_key",
                                                    join_partitions)
        check_bucket_caps(sizes, max_bucket, "MinHashIndex.ingest")
        pairs = pairs_from_buckets(
            hot, "band_key",
            lambda g: candidate_pairs_from_bucket(g, id_col, max_bucket),
            ["id_a", "id_b"], {}, hot_rows,
        )
        ids_ref = ray.put(new_ids)
        pairs = pairs.map_batches(
            lambda t: t.filter(pc.or_(
                pc.is_in(t["id_a"], value_set=ray.get(ids_ref)),
                pc.is_in(t["id_b"], value_set=ray.get(ids_ref)))),
            batch_format="pyarrow",
        )
        verified = verify_pairs_jaccard(
            corpus_ds, pairs, threshold=threshold,
            shingle_k=meta["shingle_k"], id_col=id_col,
            join_partitions=join_partitions).materialize()

        # 4. append the new band rows, one file per touched bucket (64-ary
        # low-cardinality groupby — not the row-cardinality regime), then
        # commit by listing them in _meta.json
        root = self.root

        def write_bucket(g: pa.Table) -> pa.Table:
            idx = MinHashIndex(root)
            b = int(g["bucket"][0].as_py())
            rel = os.path.join(BANDS, f"bucket={b:04d}",
                               f"e{label}-{uuid.uuid4().hex[:8]}.parquet")
            path = idx._p(rel)
            idx.fs.makedirs(os.path.dirname(path))
            idx.fs.write_parquet(g.drop_columns(["bucket"]), path,
                                 compression="zstd")
            return pa.table({"bucket": pa.array([b], pa.int64()),
                             "path": pa.array([rel], pa.string()),
                             "rows": pa.array([len(g)], pa.int64())})

        written = new_bands.groupby("bucket").map_groups(
            write_bucket, batch_format="pyarrow").take_all()
        meta = self.meta()  # re-read: concurrent epochs on other labels
        meta["epochs"][label] = {
            "rows": int(len(new_tbl)),
            "files": [{"bucket": int(w["bucket"]), "path": w["path"]}
                      for w in written],
            "source_version": source_version,
        }
        if source_version is not None:
            meta["indexed_version"] = source_version
        self.fs.put_json(self._p(META), meta)
        return verified
