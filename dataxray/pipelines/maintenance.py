"""Lake maintenance operations: repartitioning and staging GC.

Repartitioning changes the url-hash partition count of an existing lake —
the one structural change ``replay()`` refuses to do implicitly (a silent
P change would mis-route every subsequent event). It is a full resolved
read → re-hash → rewrite into a NEW lake root (never in place: readers of
the old root stay consistent; cut-over is a path swap, like the
reference's preSql table-swap pattern, WriterUtil.renderPreOrPostSqls).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa

from ..hashing import partition_of
from ..schema import PART_COL
from ..state.manifest import Lake


def repartition_lake(src_root: str, dest_root: str, new_num_partitions: int) -> dict:
    """Rewrite a lake under a different partition count. Returns summary."""
    import ray

    src = Lake(src_root)
    src.validate_partitioner()
    dest = Lake(dest_root)
    if dest.exists():
        raise FileExistsError(f"destination lake {dest_root} already exists")
    dest.init(new_num_partitions, src.event_schema())
    run_id = uuid.uuid4().hex[:12]
    wm = src.watermarks()
    src_parts = sorted(wm)

    @ray.remote(num_cpus=1, num_returns=max(new_num_partitions, 2))
    def split_partition(p: int):
        # num_returns >= 2 so Ray always unpacks the tuple (num_returns=1
        # would deliver the whole 1-tuple as a single object); the dummy
        # second slot for P=1 is dropped below
        t = Lake(src_root).resolve(p)
        if t is None or len(t) == 0:
            return tuple(None for _ in range(max(new_num_partitions, 2)))
        codes = partition_of(t["url"], new_num_partitions)
        t = t.append_column(PART_COL, pa.array(codes))
        from ..stages.exchange import split_by_part

        out = list(split_by_part(t, new_num_partitions))
        while len(out) < 2:
            out.append(None)
        return tuple(out)

    @ray.remote(num_cpus=1)
    def write_partition(p: int, txn_hi: int, *tables):
        parts = [t for t in tables if t is not None and len(t)]
        if not parts:
            return None
        merged = pa.concat_tables(parts, promote_options="permissive")
        meta = Lake(dest_root).write_staged(run_id, p, merged)
        return {"partition": p, "txn_hi": txn_hi, **meta}

    per_new: list[list] = [[] for _ in range(new_num_partitions)]
    for p in src_parts:
        outs = split_partition.remote(p)
        for q, r in enumerate(outs[:new_num_partitions]):
            per_new[q].append(r)
    # destination watermark must be the MIN across source partitions: a
    # lagging source partition may still have unapplied WAL events below the
    # max, and stamping max would make future replays skip them silently
    txn_hi = min(wm.values(), default=0)
    metas = ray.get([
        write_partition.remote(q, txn_hi, *per_new[q]) for q in range(new_num_partitions)
    ])
    committed = 0
    for m in metas:
        if m is None:
            continue
        if dest.commit(m["partition"], txn_hi, m["staged"], m["row_count"],
                       m["num_bytes"], run_id) == "committed":
            committed += 1
    dest.cleanup_staging(run_id)
    return {"partitions_committed": committed, "txn_hi": txn_hi,
            "num_partitions": new_num_partitions}


def sweep_staging(lake_root: str, max_age_sec: float = 3600.0) -> int:
    """Remove orphaned staging dirs left by crashed runs (their commits never
    landed, so the files are dead weight). Age-gated so a concurrently
    running replay's staging survives."""
    from ..state import lakefs

    fs, base = lakefs.resolve(lake_root)
    staging = os.path.join(base, "_staging")
    removed = 0
    now = time.time()
    for name in fs.list_names(staging):
        d = os.path.join(staging, name)
        try:
            m = fs.mtime(d)
            # unknown mtime (e.g. virtual S3 directory prefixes report none)
            # must NOT read as "infinitely old" — that would sweep a
            # concurrently running replay's live staging. Skip instead.
            if m > 0 and now - m > max_age_sec:
                fs.delete_tree(d)
                removed += 1
        except FileNotFoundError:  # pragma: no cover
            continue
    return removed


def export_snapshot(lake_dir: str, dest_dir: str,
                    columns: list[str] | None = None,
                    predicate=None, as_of_txn: int | None = None,
                    compression: str = "zstd") -> dict:
    """RESUMABLE snapshot export (CTAS): write the lake's resolved state as
    plain partitioned parquet under ``dest_dir`` — one
    ``part-{p:05d}.parquet`` + ``_done-{p:05d}`` marker per lake bucket,
    one distributed task each.

    Resumability is per partition: a marker is renamed into place only
    AFTER its file is fully written, so a crashed export re-runs only the
    unmarked buckets (verified by the crash test). Never one giant file;
    a 100 TB export is P independent tasks any of which can retry.
    Column projection and predicate pushdown ride the same scan path as
    Lake.dataset (footer pruning + post-LWW filter). Returns
    {written, skipped, rows}."""
    import ray

    from ..state.manifest import Lake
    from ..state.predicate import normalize

    lake = Lake(lake_dir)
    os.makedirs(dest_dir, exist_ok=True)
    pred = normalize(predicate)
    parts = sorted(lake.watermarks(lake._resolve_gen(None, as_of_txn)))

    @ray.remote(num_cpus=1)
    def export_one(p: int) -> tuple[int, int]:
        import pyarrow.parquet as _pq

        done = os.path.join(dest_dir, f"_done-{p:05d}")
        if os.path.exists(done):
            return 0, 0
        t = Lake(lake_dir).resolve(p, as_of_txn)
        if t is None:
            t = pa.table({})
        if pred is not None and len(t):
            t = pred.filter_table(t)
        if columns and len(t):
            t = t.select(columns)
        out = os.path.join(dest_dir, f"part-{p:05d}.parquet")
        tmp = out + ".tmp"
        _pq.write_table(t, tmp, compression=compression)
        os.replace(tmp, out)
        open(done + ".tmp", "w").close()
        os.replace(done + ".tmp", done)
        return 1, len(t)

    results = ray.get([export_one.remote(p) for p in parts])
    written = sum(w for w, _ in results)
    return {"written": written, "skipped": len(parts) - written,
            "rows": sum(r for _, r in results)}
