"""Filesystem backends for the lake commit protocol.

The reference's hdfswriter commits by renaming temp files into place
(HdfsWriter.java:196,293-326) — a protocol that only works on filesystems
with atomic rename (local disk, HDFS). Object stores (S3/GCS/OSS — the
storage a 100 TB multi-node lake actually lives on) have NO rename: only
whole-object PUT (atomic per object), server-side COPY, DELETE and LIST.

So the lake speaks to storage through this small interface with two
semantic families:

* ``LocalLakeFS`` — rename-capable (local disk; HDFS shares the contract):
  ``finalize`` is an atomic rename, manifest swap is write-tmp + fsync +
  rename.
* ``ObjectLakeFS`` — put-semantics over any ``pyarrow.fs.FileSystem``:
  ``finalize`` is server-side copy + delete of the staged object (never
  rename), manifest swap is a single-object PUT (atomic on real object
  stores: readers see the old or the new manifest, never a torn one).
  Directories are virtual (``makedirs`` only materializes them where the
  underlying fs needs it).

Why the protocol stays exactly-once without rename: staged files have uuid
names (retries collide on nothing), the manifest PUT is the single commit
point, and the ``(partition, txn_hi)`` label is monotonic — a replayed
commit is recognized by label BEFORE any write, so last-writer-wins PUT
visibility is sufficient under the lake's single-writer-per-partition
design (StarRocks label pattern, StarRocksWriterManager.java:52).

Root scheme dispatch (``resolve``):
    /path/to/lake          → LocalLakeFS
    file:///path           → LocalLakeFS
    mocks3:///path         → ObjectLakeFS over pyarrow LocalFileSystem —
                             the in-sandbox object-store stand-in: same
                             code path as S3, local bytes (no rename ever
                             issued; enforced by construction)
    s3://bucket/prefix     → ObjectLakeFS over pyarrow S3FileSystem
                             (production; needs credentials/network)
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


class LocalLakeFS:
    """Rename-capable backend: plain os/pyarrow calls, atomic os.replace."""

    scheme = "file"

    def __init__(self, base: str):
        self.base = base
        self.pafs = None  # ray.data / pq default local handling

    # --- namespace ---
    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_names(self, path: str) -> list[str]:
        return os.listdir(path) if os.path.isdir(path) else []

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    # --- objects ---
    def read_json(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def put_json(self, path: str, obj: dict) -> None:
        """Atomic visibility via write-tmp + fsync + rename."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write_parquet(self, table: pa.Table, path: str, compression: str) -> None:
        pq.write_table(table, path, compression=compression)

    def read_parquet(self, path: str) -> pa.Table:
        return pq.read_table(path)

    def finalize(self, src: str, dest: str) -> None:
        os.replace(src, dest)

    def delete_file(self, path: str) -> None:
        if os.path.exists(path):
            os.remove(path)

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class ObjectLakeFS:
    """Put-semantics backend over a ``pyarrow.fs.FileSystem``.

    Uses ONLY operations object stores offer: put (open_output_stream of a
    whole object), copy_file (server-side copy), delete, list. Rename is
    never called — this class is the proof the commit protocol holds on
    S3-class storage; ``mocks3://`` runs it against local bytes so the
    whole crash/resume suite exercises this exact code path in-sandbox.
    """

    def __init__(self, pafs, base: str, scheme: str = "mocks3"):
        self.pafs = pafs
        self.base = base
        self.scheme = scheme

    # --- namespace ---
    def _info(self, path: str):
        from pyarrow.fs import FileType

        info = self.pafs.get_file_info(path)
        return None if info.type == FileType.NotFound else info

    def exists(self, path: str) -> bool:
        return self._info(path) is not None

    def isdir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        info = self._info(path)
        return info is not None and info.type == FileType.Directory

    def makedirs(self, path: str) -> None:
        # object stores have no real directories; create where the backing
        # fs wants one (local emulation), harmless no-op-ish on S3
        self.pafs.create_dir(path, recursive=True)

    def list_names(self, path: str) -> list[str]:
        from pyarrow.fs import FileSelector

        if not self.isdir(path):
            return []
        infos = self.pafs.get_file_info(FileSelector(path, recursive=False))
        return [os.path.basename(i.path.rstrip("/")) for i in infos]

    def mtime(self, path: str) -> float:
        info = self._info(path)
        if info is None or info.mtime is None:
            return 0.0
        return info.mtime.timestamp()

    def size(self, path: str) -> int:
        info = self._info(path)
        return int(info.size) if info is not None and info.size is not None else 0

    # --- objects ---
    def read_json(self, path: str) -> dict:
        with self.pafs.open_input_stream(path) as f:
            return json.loads(f.read().decode())

    def put_json(self, path: str, obj: dict) -> None:
        # single-object PUT — atomic on real object stores (readers never
        # see a torn object); label dedup happens before this call, so
        # last-writer-wins visibility is safe for the single-writer lake
        payload = json.dumps(obj, indent=1).encode()
        self.pafs.create_dir(os.path.dirname(path), recursive=True)
        with self.pafs.open_output_stream(path) as f:
            f.write(payload)

    def write_parquet(self, table: pa.Table, path: str, compression: str) -> None:
        pq.write_table(table, path, filesystem=self.pafs, compression=compression)

    def read_parquet(self, path: str) -> pa.Table:
        return pq.read_table(path, filesystem=self.pafs)

    def finalize(self, src: str, dest: str) -> None:
        """Staged object → final key: server-side copy + delete. NO rename."""
        self.pafs.copy_file(src, dest)
        self.pafs.delete_file(src)

    def delete_file(self, path: str) -> None:
        if self.exists(path):
            self.pafs.delete_file(path)

    def delete_tree(self, path: str) -> None:
        try:
            self.pafs.delete_dir(path)
        except (FileNotFoundError, OSError):
            pass


def s3_options() -> dict:
    """S3FileSystem options from the environment. Credentials and the
    default region come from the standard AWS_* variables (pyarrow reads
    them natively); these add the knobs pyarrow does NOT read itself —
    endpoint override (MinIO/localstack/on-prem gateways) and an explicit
    region pin. Workers resolve the same root string with the same env, so
    the options travel to every node without serializing a client."""
    import os as _os

    opts: dict = {}
    if _os.environ.get("DATAXRAY_S3_ENDPOINT"):
        opts["endpoint_override"] = _os.environ["DATAXRAY_S3_ENDPOINT"]
    if _os.environ.get("DATAXRAY_S3_REGION"):
        opts["region"] = _os.environ["DATAXRAY_S3_REGION"]
    if _os.environ.get("DATAXRAY_S3_ALLOW_HTTP"):
        opts["scheme"] = "http"
    return opts


def resolve(root: str) -> tuple[LocalLakeFS | ObjectLakeFS, str]:
    """Parse a lake root into (backend, base_path). Workers reconstruct the
    backend from the same root string (Lake(root) inside merge tasks)."""
    if root.startswith("mocks3://"):
        from pyarrow.fs import LocalFileSystem

        base = root[len("mocks3://"):]
        return ObjectLakeFS(LocalFileSystem(), base, scheme="mocks3"), base
    if root.startswith("s3://"):
        from pyarrow.fs import S3FileSystem

        base = root[len("s3://"):]
        return ObjectLakeFS(S3FileSystem(**s3_options()), base, scheme="s3"), base
    if root.startswith("file://"):
        base = root[len("file://"):]
        return LocalLakeFS(base), base
    return LocalLakeFS(root), root
