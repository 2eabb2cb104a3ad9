"""End-to-end CDC replay: WAL tail → validate → url-hash shuffle → LWW merge
→ exactly-once lake commit.

This is the engine's flagship pipeline — the Ray-Data re-expression of a
DataX reader→transformer→writer job (JobContainer.start, §3.1 of SURVEY.md)
crossed with otsstreamreader's checkpointed change-stream replay (§3.3):

    read_parquet(event shards, footer-pruned by watermark, unified schema)
      → map_batches(Validate)           # dirty side-channel + error budget
      → map_batches(align to evolved schema)
      → map_batches(AssignPartition)    # _part = hash(url) % P  (+ salt)
      → map_batches(BatchCombiner)      # pre-shuffle LWW combiner
      [salted: groupby(_salt).map_groups(lww_reduce)]   # hot-key stage A
      → groupby(_part).map_groups(merge+stage-write)    # THE shuffle
      → driver: label-deduped manifest commits (exactly-once)

Everything streams: the only driver-side materialization is one small
metadata row per touched partition. Untouched partitions are never read or
rewritten (incremental replay prunes at the file level by the global low
watermark and per-partition by manifest txn_hi).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import ErrorLimit, check_budget
from ..schema import META_FIELDS, OP_INSERT, PART_COL, SALT_COL, align_table, unify
from ..sources import wal
from ..stages.decode import Validate
from ..stages.merge import BatchCombiner, lww_reduce, merge_partition
from ..stages.partition import AssignPartition
from ..state.checkpoint import RunReport, global_low_watermark
from ..state.manifest import Lake


@dataclass(frozen=True)
class ReplayConfig:
    num_partitions: int = 32
    num_salts: int = 0  # >1 enables the salted two-stage merge
    auto_salt: bool = False  # salt only detected heavy-hitter urls
    hot_frac: float = 0.01  # per-batch hot threshold for auto_salt
    batch_size: int | None = 32_768
    # "direct" (default) = raw-task hash exchange (stages/exchange.py):
    # measured faster than the sort shuffle at every parallelism level AND
    # ~5x less sensitive to co-tenant noise (BASELINE.md round-3 A/B — best
    # 11.1s vs 27.0s at 8 CPUs, 12.4s vs 12.8s at 32); the merge key is a
    # precomputed int partition id, so the sort path's boundary sampling and
    # per-block sorts buy nothing. "sort" = Ray groupby shuffle (keeps the
    # generic path exercised; the salted pre-merge stage always uses it).
    exchange: str = "direct"
    # 2 = two-level direct exchange (split → √P coarse groups → fan-out):
    # cuts driver ObjectRef bookkeeping from O(split_tasks×P) to
    # O(split_tasks×√P + split_tasks×P/regroup) at the cost of one extra
    # task hop per row. Worth it when split_tasks×P is large (big cluster /
    # many partitions); None = env DATAXRAY_EXCHANGE_LEVELS, default 1.
    exchange_levels: int | None = None
    exchange_regroup: int | None = None  # level-1 slices per fan-out task
    sink_mode: str = "rewrite"  # "delta": append per-epoch LWW winners, resolve on read
    history: bool = False  # retain every committed version (time travel / CDF)
    compact_threshold: int = 8  # delta files per partition before auto-compaction
    error_limit: ErrorLimit = ErrorLimit()
    dirty_dir: str | None = None
    stall_timeout_sec: float | None = None  # per-partition merge watchdog
    # speed caps (Channel.java:148-204 flow control): protect a shared WAL
    # store / destination from a full-speed backfill. None = unthrottled.
    records_per_sec: float | None = None
    bytes_per_sec: float | None = None


def _tune_read_parallelism() -> None:
    """Size read tasks to the cluster: ~2 blocks per CPU. Ray's default floor
    of 200 read blocks turns this pipeline into hundreds of ~10ms tasks and
    makes the driver dispatch loop the critical path (measured 2-3x slower).
    Only overrides the untouched default so callers keep control."""
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if ctx.read_op_min_num_blocks == 200 and ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
        ctx.read_op_min_num_blocks = max(16, cpus * 2)


def _merge_tables(p: int, tables: list[pa.Table], lake_root: str, run_id: str,
                  wm: dict, target: pa.Schema, sink_mode: str = "rewrite",
                  compact_threshold: int = 8, monitor=None) -> dict:
    """Per-partition final merge used by both exchange paths: filter by the
    partition watermark, stage new state, return small commit metadata.

    sink_mode="rewrite": fold in current state, produce the resolved
    partition (one base file). sink_mode="delta": write ONLY this epoch's
    LWW winners (tombstones included) as an appended delta — the state is
    never read, so an epoch touching k rows costs O(k), not O(partition);
    when the partition accumulates compact_threshold deltas the task
    compacts (full merge + rewrite) instead."""
    from ..stages.merge import strip_counts

    if monitor is not None:
        monitor.beat.remote(p, "start")  # fire-and-forget heartbeat
    events = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="permissive"
    )
    # -1 = virgin partition: even txn 0 (base-page bootstrap) is unapplied
    watermark = wm.get(p, -1)
    events = events.filter(pc.greater(events["txn_id"], watermark))
    # exact applied-event accounting: _cnt sums the source rows each combiner
    # winner absorbed; rows at/below the watermark were applied by a prior run
    events, n_events = strip_counts(events)
    if len(events) == 0:
        if monitor is not None:
            monitor.beat.remote(p, "done")
        return {"partition": p, "txn_hi": watermark, "staged": [],
                "row_count": 0, "num_bytes": 0, "noop": True, "mode": "none",
                "n_events": 0}
    part_lake = Lake(lake_root)
    txn_hi = max(watermark, pc.max(events["txn_id"]).as_py())
    manifest = part_lake.manifest(p)
    use_delta = (
        sink_mode == "delta"
        and manifest is not None  # first write of a partition is its base
        and manifest.get("n_deltas", 0) + 1 < compact_threshold
    )
    if use_delta:
        merged = lww_reduce(events)  # winners incl. tombstones, op kept
        mode = "delta"
    else:
        state = part_lake.read_state(p)
        merged = merge_partition(events, state, target, watermark)
        mode = "rewrite"
    meta = part_lake.write_staged(run_id, p, merged)
    if monitor is not None:
        monitor.beat.remote(p, "done")
    return {"partition": p, "txn_hi": txn_hi, "staged": meta["staged"],
            "row_count": meta["row_count"], "num_bytes": meta["num_bytes"],
            "noop": False, "mode": mode, "n_events": n_events}


class _AssignCombineFuse:
    """Per-block assign-partition + LWW-combine, fused into the direct
    exchange's split task (see direct_exchange fuse_fn)."""

    def __init__(self, cfg: "ReplayConfig"):
        self.assign = AssignPartition(cfg.num_partitions, 0)
        self.combine = BatchCombiner(counted=True)

    def __call__(self, block: pa.Table) -> pa.Table:
        return self.combine(self.assign(block))


def _warn_if_backlog_exceeds_memory(files) -> None:
    """One replay's sort shuffle holds the pass's decoded events in the
    object store; a backlog much larger than the store spills to disk and
    collapses throughput ~10x (measured, BASELINE.md). Steer big backlogs
    to pipelines.tail.replay_chunked instead of degrading silently."""
    import warnings

    try:
        import ray

        store = ray.available_resources().get("object_store_memory", 0) or             ray.cluster_resources().get("object_store_memory", 0)
    except Exception:  # pragma: no cover
        return
    if not store:
        return
    nbytes = sum(f.nbytes for f in files)
    # zstd parquet decodes to roughly 3-5x in Arrow; warn at ~1/8 of store
    if nbytes * 4 > store / 2:
        warnings.warn(
            f"replaying {nbytes >> 20} MiB of WAL in one pass may spill the "
            f"object store ({int(store) >> 30} GiB); consider "
            "pipelines.tail.replay_chunked for bounded sub-epochs",
            stacklevel=3,
        )


def _pages_as_events(pages_ds, target: pa.Schema):
    """Bootstrap: lift the base web-page table into the event stream at
    (txn_id=0, seq=0, op='I') — base state is just the oldest write."""

    def lift(batch: pa.Table) -> pa.Table:
        n = len(batch)
        batch = batch.append_column("txn_id", pa.nulls(n, pa.int64()).fill_null(0))
        batch = batch.append_column("seq", pa.nulls(n, pa.int64()).fill_null(0))
        batch = batch.append_column("op", pa.nulls(n, pa.string()).fill_null(OP_INSERT))
        return align_table(batch, target)

    return pages_ds.map_batches(lift, batch_format="pyarrow")


def replay(
    events_dir,  # str dir (local or mocks3://, s3://) | list[EventFile] | None
    lake_dir: str,
    pages_path: str | None = None,
    cfg: ReplayConfig = ReplayConfig(),
) -> RunReport:
    """Replay all unapplied change events into the lake; resumable/idempotent.

    Can be called repeatedly (epochs, crash-resume, duplicate delivery): the
    manifests' per-partition txn watermarks make every re-application a no-op.
    ``events_dir`` may also be an explicit list of wal.EventFile (the chunked
    backlog path) — every path in it must be visible cluster-wide.
    """
    started = time.perf_counter()
    run_id = uuid.uuid4().hex[:12]
    report = RunReport(run_id=run_id)
    lake = Lake(lake_dir)
    _tune_read_parallelism()
    # per-run dirty subdir: epochs re-validate unpruned WAL files, so a
    # shared dir would double-count the same bad rows across runs and trip
    # the budget on clean data (the budget is a per-job contract)
    dirty_dir = os.path.join(cfg.dirty_dir, run_id) if cfg.dirty_dir else None

    bootstrap = not lake.exists()
    if not bootstrap:
        lake.validate_partitioner()
        from .maintenance import sweep_staging

        # GC staging orphans from crashed runs. 24h grace: the lake is
        # single-writer by design, but a generous window also protects any
        # long compaction that does run concurrently by mistake
        sweep_staging(lake.root, max_age_sec=24 * 3600)
        if lake.num_partitions() != cfg.num_partitions:
            raise RuntimeError(
                f"lake has {lake.num_partitions()} partitions, config asks "
                f"{cfg.num_partitions}; re-bucket the live lake first with "
                "Lake.evolve_partitions(new_p) (manifest-recorded epoch "
                "boundary), or rewrite offline via maintenance.repartition_lake"
            )

    watermarks = lake.watermarks() if not bootstrap else {}
    low = global_low_watermark(watermarks, cfg.num_partitions) if not bootstrap else 0
    if not bootstrap and pages_path is None:
        # crash-safe bootstrap resume: if a prior run died before every
        # partition committed, fold the recorded base pages back in
        pages_path = lake.bootstrap_pages()
    include_pages = pages_path is not None and (
        bootstrap or len(watermarks) < cfg.num_partitions
    )

    # ---- source(s) ----
    streams = []
    schemas = []
    rows_hint = 0
    txn_hi_run = low
    if events_dir is not None:
        # resolve the source ONCE (a dir path — local or object-store — or a
        # pre-scanned cluster-visible file list from replay_chunked)
        ev_files = wal.prune_files(wal.resolve_files(events_dir), low)
        ev_ds, ev_schema, n, txn_hi_run = wal.read_events(ev_files, low_watermark=low)
        if ev_ds is not None:
            _warn_if_backlog_exceeds_memory(ev_files)
            streams.append(("events", ev_ds))
            schemas.append(ev_schema)
            rows_hint += n
    if include_pages:
        import pyarrow.parquet as pq
        import ray.data

        pages_ds = ray.data.read_parquet(pages_path)
        page_schema = pq.read_schema(pages_path)
        schemas.append(pa.schema(list(page_schema) + [pa.field(n, t) for n, t in META_FIELDS]))
        streams.append(("pages", pages_ds))
        rows_hint += pq.read_metadata(pages_path).num_rows

    if bootstrap:
        target = unify(schemas) if schemas else None
        if target is None:
            raise ValueError("nothing to replay: no events and no pages")
        lake.init(cfg.num_partitions, target, pages_path=pages_path,
                  history=cfg.history)
    else:
        target = unify([lake.event_schema()] + schemas) if schemas else None
        if target is None or not streams:
            return report.finish(started)  # fully caught up
        if not target.equals(lake.event_schema()):
            lake.evolve_schema(target)  # additive promotion, safe pre-commit

    # ---- assemble the dataset ----
    ds = None
    for kind, s in streams:
        if kind == "pages":
            s = _pages_as_events(s, target)
        else:
            s = s.map_batches(Validate(dirty_dir), batch_format="pyarrow",
                              batch_size=cfg.batch_size)
            s = s.map_batches(lambda t, tgt=target: align_table(t, tgt),
                              batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = s if ds is None else ds.union(s)

    if cfg.records_per_sec or cfg.bytes_per_sec:
        from ..stages.ratelimit import RateLimiter

        throttle_conc = 4  # global cap split across concurrent limiter actors
        ds = ds.map_batches(
            RateLimiter,
            fn_constructor_args=(
                cfg.records_per_sec / throttle_conc if cfg.records_per_sec else None,
                cfg.bytes_per_sec / throttle_conc if cfg.bytes_per_sec else None,
            ),
            batch_format="pyarrow", batch_size=8192, concurrency=throttle_conc,
            num_cpus=0.25,  # limiter actors mostly sleep; reserving whole
            # CPUs would starve the read/merge tasks on small clusters
        )

    # fused direct path: assign+combine run INSIDE the exchange's split task
    # (no separate map stage, one less plasma round-trip per block)
    fused_direct = cfg.exchange == "direct" and cfg.num_salts <= 1
    if not fused_direct:
        ds = ds.map_batches(
            AssignPartition(cfg.num_partitions, cfg.num_salts,
                            auto_salt=cfg.auto_salt, hot_frac=cfg.hot_frac),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )
        ds = ds.map_batches(BatchCombiner(counted=True), batch_format="pyarrow",
                            batch_size=cfg.batch_size)

    if cfg.num_salts > 1:
        # stage A: per-(part,salt) partial LWW winners (hot-url mitigation);
        # counted so _cnt keeps summing through the partial reduce
        from ..stages.merge import lww_reduce_counted

        ds = ds.groupby(SALT_COL).map_groups(
            lambda g: lww_reduce_counted(g), batch_format="pyarrow"
        )
        ds = ds.drop_columns([SALT_COL])

    lake_root, wm, tgt = lake.root, dict(watermarks), target
    watchdog = None
    if cfg.stall_timeout_sec:
        from ..state.watchdog import Watchdog

        watchdog = Watchdog(cfg.stall_timeout_sec)
        watchdog.start()
    merge_kwargs = dict(lake_root=lake_root, run_id=run_id, wm=wm, target=tgt,
                        sink_mode=cfg.sink_mode,
                        compact_threshold=cfg.compact_threshold,
                        monitor=watchdog.monitor if watchdog else None)

    if cfg.exchange == "direct":
        from ..stages.exchange import direct_exchange

        fuse = _AssignCombineFuse(cfg) if fused_direct else None
        meta_rows = direct_exchange(ds, cfg.num_partitions, _merge_tables,
                                    merge_kwargs, fuse_fn=fuse,
                                    levels=cfg.exchange_levels,
                                    regroup=cfg.exchange_regroup)
    else:
        def merge_and_stage(group: pa.Table) -> pa.Table:
            """Per-partition final merge; writes new state to staging, emits
            one metadata row. Runs distributed; only metadata returns."""
            p = group[PART_COL][0].as_py()
            m = _merge_tables(p, [group.drop_columns([PART_COL])], **merge_kwargs)
            return pa.table(
                {"partition": pa.array([m["partition"]], pa.int32()),
                 "txn_hi": pa.array([m["txn_hi"]]),
                 "staged": pa.array([m["staged"]], pa.list_(pa.string())),
                 "row_count": pa.array([m["row_count"]]),
                 "num_bytes": pa.array([m["num_bytes"]]),
                 "noop": pa.array([m["noop"]]),
                 "mode": pa.array([m["mode"]]),
                 "n_events": pa.array([m["n_events"]], pa.int64())}
            )

        grouped = ds.groupby(PART_COL).map_groups(
            merge_and_stage, batch_format="pyarrow"
        )
        meta_rows = grouped.take_all()
        if os.environ.get("DATAXRAY_PRINT_STATS"):
            # phase attribution for scaling analysis (BASELINE.md): Ray Data's
            # per-operator wall/cpu breakdown of the executed plan
            import sys as _sys

            print(grouped.stats(), file=_sys.stderr)

    if watchdog is not None:
        watchdog.stop()
        report.stalled_partitions = watchdog.stalled()

    # ---- error budget (before commit: a failed budget aborts cleanly) ----
    n_dirty = 0
    if dirty_dir is not None:
        n_dirty = check_budget(dirty_dir, rows_hint, cfg.error_limit)
    report.total_error_records = n_dirty
    # applied count from the merge side (sum of post-watermark-filter source
    # events per partition) — the footer rows hint re-counted every row of
    # every re-read file on incremental epochs. See lww_reduce_counted for
    # the (bounded) residual combiner-absorption approximation.
    report.read_succeed_records = sum(int(m["n_events"]) for m in meta_rows)

    # ---- exactly-once commit loop (driver, label = (partition, txn_hi)) ----
    for m in meta_rows:
        if m["noop"]:
            continue
        status = lake.commit(
            int(m["partition"]), int(m["txn_hi"]), list(m["staged"]),
            int(m["row_count"]), int(m["num_bytes"]), run_id,
            mode=str(m["mode"]),
        )
        if status == "committed":
            report.partitions_committed += 1
            report.write_succeed_records += int(m["row_count"])
            report.txn_hi = max(report.txn_hi, int(m["txn_hi"]))
        else:
            report.partitions_skipped += 1
    # every partition provably applied all files up to txn_hi_run (events are
    # globally txn-ordered and the run read every file above the low
    # watermark) — advance ALL watermarks to it so they stay uniform: the
    # global low watermark (file pruning, bootstrap completion) moves, and an
    # empty hash bucket cannot pin it forever
    committed_hi = {int(m["partition"]): int(m["txn_hi"]) for m in meta_rows}
    # cap the advance at the max txn actually APPLIED from valid events: a
    # corrupt/outlier txn_id in a file footer could otherwise poison every
    # watermark and silently skip all future legitimate events
    max_applied = max(committed_hi.values(), default=low)
    advance_to = min(txn_hi_run, max_applied)
    if advance_to > low:
        for p in range(cfg.num_partitions):
            cur = committed_hi.get(p, wm.get(p, -1))
            if cur < advance_to:
                lake.commit(p, advance_to, [], 0, 0, run_id, mode="watermark")
            report.partition_lag[p] = max(cur, advance_to)
    else:
        report.partition_lag.update(committed_hi)
    lake.cleanup_staging(run_id)
    report.finish(started)
    report.write(lake.root)
    return report
