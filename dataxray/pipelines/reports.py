"""Driver-facing query pipelines over the testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
columns match the DuckDB oracle in ``__ray_entry__.oracle_sql`` exactly
(names AND values). Ray is already initialised by the caller — nothing here
calls ray.init().

The CDC queries exercise the full engine: the ``events`` table is lifted
into a change-event WAL (signup→I, error→D, else U; txn_id=event_id) and
replayed through the url-hash-partitioned LWW merge into a /tmp lake; the
oracle is the equivalent window-function SQL.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.transforms import DxDigest, DxFilter, DxPad, DxReplace, DxSubstr, TransformChain
from ..pipelines.replay import ReplayConfig, replay
from ..state.manifest import Lake

KNN_QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
KNN_K = 5
EMB_DUP_THRESHOLD = 0.3
RANGE_SPLITS = 8


def _rd():
    import ray.data

    from .replay import _tune_read_parallelism

    _tune_read_parallelism()
    return ray.data


def _scratch(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join("/tmp", "dataxray_q", f"{name}-{tag}")


# ---------------------------------------------------------------------------
# CDC replay over the events table (the flagship)
# ---------------------------------------------------------------------------


def _events_as_wal(sf_dir: str) -> str:
    """Lift events.parquet into change-event shards (cached per sf_dir).

    Mapping: url = 'https://user'||user_id (key), txn_id = event_id (global
    monotonic), seq = 0, op: signup→I, error→D (tombstone), else U; payload
    (warc_ts, text, lang) = (ts, props, event_type); D rows get null payload
    per the multi-version tombstone convention (MultiVerModeRecordSender.java:58-61).
    """
    out = _scratch(sf_dir, "wal")
    done = os.path.join(out, "_done")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    t = t.sort_by("event_id")
    url = pc.binary_join_element_wise(
        "https://user", pc.cast(t["user_id"], pa.string()), ""
    )
    op = pc.if_else(
        pc.equal(t["event_type"], "signup"),
        pa.scalar("I"),
        pc.if_else(pc.equal(t["event_type"], "error"), pa.scalar("D"), pa.scalar("U")),
    )
    is_del = pc.equal(op, "D")
    wal = pa.table(
        {
            "url": url,
            "txn_id": t["event_id"],
            "seq": pa.nulls(len(t), pa.int64()).fill_null(0),
            "op": op,
            "warc_ts": pc.if_else(is_del, pa.scalar(None, t.schema.field("ts").type), t["ts"]),
            "text": pc.if_else(is_del, pa.scalar(None, pa.string()), t["props"]),
            "lang": pc.if_else(is_del, pa.scalar(None, pa.string()), t["event_type"]),
        }
    )
    # shard by txn range so watermark pruning has file granularity
    n_shards = 4
    per = (len(wal) + n_shards - 1) // n_shards
    for s in range(n_shards):
        part = wal.slice(s * per, per)
        if len(part):
            pq.write_table(part, os.path.join(out, f"events-{s:05d}.parquet"))
    open(done, "w").close()
    return out


def _final_state(lake_dir: str) -> pa.Table:
    t = Lake(lake_dir).read_all()
    return t.select(["url", "txn_id", "warc_ts", "text", "lang"]).sort_by("url")


def cdc_lww_replay(sf_dir: str, num_salts: int = 0, epochs: int = 1) -> pa.Table:
    wal = _events_as_wal(sf_dir)
    lake = _scratch(sf_dir, f"lake-s{num_salts}-e{epochs}")
    shutil.rmtree(lake, ignore_errors=True)
    cfg = ReplayConfig(num_partitions=16, num_salts=num_salts)
    if epochs == 1:
        replay(wal, lake, cfg=cfg)
    else:
        # incremental: feed the WAL shard-by-shard in txn order, resuming from
        # the manifests' watermarks each time (checkpointed replay)
        files = sorted(f for f in os.listdir(wal) if f.endswith(".parquet"))
        staged = _scratch(sf_dir, f"walstage-e{epochs}")
        shutil.rmtree(staged, ignore_errors=True)
        os.makedirs(staged)
        chunk = max(1, len(files) // epochs)
        for i in range(0, len(files), chunk):
            for f in files[i : i + chunk]:
                shutil.copy(os.path.join(wal, f), staged)
            replay(staged, lake, cfg=cfg)
    return _final_state(lake)


def cdc_lww_salted(sf_dir: str) -> pa.Table:
    return cdc_lww_replay(sf_dir, num_salts=4)


def cdc_incremental(sf_dir: str) -> pa.Table:
    return cdc_lww_replay(sf_dir, epochs=4)


# ---------------------------------------------------------------------------
# dx_* transforms (column names match the oracle aliases)
# ---------------------------------------------------------------------------


def _rename(t: pa.Table, old: str, new: str) -> pa.Table:
    return t.rename_columns([new if c == old else c for c in t.column_names])


def dx_substr_part(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "part.parquet"),
                            columns=["p_partkey", "p_name"])
    return ds.map_batches(
        lambda t: _rename(DxSubstr("p_name", 2, 8).apply(t), "p_name", "p_sub"),
        batch_format="pyarrow",
    )


def dx_pad_nation(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"])
    return ds.map_batches(
        lambda t: _rename(DxPad("n_name", "l", 12, "*").apply(t), "n_name", "n_padded"),
        batch_format="pyarrow",
    )


def dx_replace_customer(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: _rename(DxReplace("c_name", 2, 4, "XX").apply(t), "c_name", "c_redacted"),
        batch_format="pyarrow",
    )


def dx_filter_like_docs(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "lang"])
    return ds.map_batches(DxFilter("lang", "like", "en|de"), batch_format="pyarrow")


def dx_filter_cmp_lineitem(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return ds.map_batches(DxFilter("l_quantity", ">", "25"), batch_format="pyarrow")


def dx_digest_docs(sf_dir: str):
    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: _rename(DxDigest("text", "md5", "toLowerCase").apply(t), "text", "text_digest"),
        batch_format="pyarrow",
    )


def transform_chain_docs(sf_dir: str):
    """Fused chain: filter (drop en) → substr(text,0,20) → md5 — the
    TransformerExchanger chain as one map_batches."""
    chain = TransformChain([
        DxFilter("lang", "like", "en"),
        DxSubstr("text", 0, 20),
        DxDigest("text", "md5", "toLowerCase"),
    ])
    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "lang", "text"])
    return ds.map_batches(chain, batch_format="pyarrow").select_columns(["doc_id", "text"])


# ---------------------------------------------------------------------------
# framework analogs: constants/pruning, casts, dirty split, range split
# ---------------------------------------------------------------------------


def const_and_prune(sf_dir: str):
    """Virtual constant column + projection (UnstructuredStorageReaderUtil
    const-value column entries; read-side pruning)."""
    ds = _rd().read_parquet(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: t.append_column("src", pa.nulls(len(t), pa.string()).fill_null("dataxray")),
        batch_format="pyarrow",
    )


def column_cast(sf_dir: str):
    """ColumnCast surface: long→string, timestamp→formatted string
    (common.column.datetimeFormat, ColumnCast.java:42-77)."""
    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts"])

    def cast(t: pa.Table) -> pa.Table:
        t = t.append_column("id_str", pc.cast(t["event_id"], pa.string()))
        # cast to second precision first: pyarrow's %S prints the fractional
        # part for sub-second units, DuckDB's does not
        secs = pc.cast(pc.floor_temporal(t["ts"], unit="second"), pa.timestamp("s"))
        t = t.append_column("ts_str", pc.strftime(secs, "%Y-%m-%d %H:%M:%S"))
        return t.drop_columns(["ts"])

    return ds.map_batches(cast, batch_format="pyarrow")


def error_split_valid(sf_dir: str):
    """Dirty-record split: rows failing the predicate go to the side-channel
    parquet; the clean stream is returned (ErrorRecordChecker contract)."""
    from ..errors import write_dirty

    dirty_dir = _scratch(sf_dir, "dirty")
    shutil.rmtree(dirty_dir, ignore_errors=True)
    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "value"])

    def split(t: pa.Table) -> pa.Table:
        bad = pc.fill_null(pc.greater(t["value"], 40.0), False)
        if pc.any(bad).as_py():
            write_dirty(dirty_dir, t.filter(bad))
        return t.filter(pc.invert(bad))

    return ds.map_batches(split, batch_format="pyarrow")


def range_split_orders(sf_dir: str):
    """Primary-key range split planner (RangeSplitUtil.doBigIntegerSplit /
    SingleTableSplitUtil analog): assign each row to one of N even key
    ranges, report per-range row counts and key bounds."""
    from ray.data.aggregate import Count, Max, Min

    ds = _rd().read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_orderkey"])
    stats = ds.aggregate(Min("o_orderkey"), Max("o_orderkey"))
    lo, hi = stats["min(o_orderkey)"], stats["max(o_orderkey)"]
    span = hi - lo + 1

    def assign(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        rid = ((k - lo) * RANGE_SPLITS) // span
        return t.append_column("range_id", pa.array(rid.astype(np.int64)))

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(Count(alias_name="n_rows"),
                   Min("o_orderkey", alias_name="key_lo"),
                   Max("o_orderkey", alias_name="key_hi"))
    )


# ---------------------------------------------------------------------------
# aggregates / joins / windows — pre-aggregated before the shuffle
# ---------------------------------------------------------------------------


def _as_scaled_int(col, scale: int):
    """Per-row fixed-point conversion (e.g. dollars→cents): the source data
    has bounded decimals, so round(x*scale) is an exact integer and the
    downstream sums are int64 — bit-identical in any engine and any
    summation order (unlike float sums, which differ by ulps per order)."""
    return pc.cast(pc.round(pc.multiply(col, float(scale)), 0), pa.int64())


def agg_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped report with per-batch partial aggregation: each batch
    emits one row per key, then the small groupby reduces partials (the
    combine-before-shuffle pattern). Monetary sums are exact fixed-point
    (cents / 1e-4) so they hash identically to the SQL oracle."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        t = t.append_column("qty_c", _as_scaled_int(t["l_quantity"], 100))
        t = t.append_column("base_c", _as_scaled_int(t["l_extendedprice"], 100))
        t = t.append_column("disc_e4", _as_scaled_int(disc_price, 10_000))
        t = t.append_column("one", pa.nulls(len(t), pa.int64()).fill_null(1))
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_e4", "sum"), ("one", "sum")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c_sum", alias_name="sum_qty_c"),
        Sum("base_c_sum", alias_name="sum_base_c"),
        Sum("disc_e4_sum", alias_name="sum_disc_e4"),
        Sum("one_sum", alias_name="n_rows"),
    )


def broadcast_join_segments(sf_dir: str):
    """orders ⋈ customer with the small side broadcast (ray.put once, dict
    lookup per batch) — no shuffle join; then pre-aggregated groupby."""
    import ray
    from ray.data.aggregate import Sum

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                                  cust["c_mktsegment"].to_pylist())))

    ds = _rd().read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_custkey", "o_totalprice"])

    class JoinAndCombine:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
            seg = pa.array([self.lookup.get(int(k)) for k in keys], pa.string())
            t = t.append_column("c_mktsegment", seg)
            t = t.filter(t["c_mktsegment"].is_valid())  # inner-join semantics
            t = t.append_column("price_c", _as_scaled_int(t["o_totalprice"], 100))
            t = t.append_column("one", pa.nulls(len(t), pa.int64()).fill_null(1))
            return pa.TableGroupBy(t, "c_mktsegment").aggregate(
                [("price_c", "sum"), ("one", "sum")]
            )

    partials = ds.map_batches(JoinAndCombine, batch_format="pyarrow", concurrency=2)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("one_sum", alias_name="n_orders"),
        Sum("price_c_sum", alias_name="revenue_c"),
    )


def hash_join_order_rows(sf_dir: str):
    """Large×large hash-partitioned join (Dataset.join, both sides shuffled
    on the key) — the non-broadcast complement to broadcast_join_segments.
    Row-level output so the join itself is what's checked."""
    orders = _rd().read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _rd().read_parquet(os.path.join(sf_dir, "customer.parquet"),
                              columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))
    out = joined.map_batches(
        lambda t: t.append_column("price_c", _as_scaled_int(t["o_totalprice"], 100))
        .drop_columns(["o_totalprice"]),
        batch_format="pyarrow",
    )
    return out.select_columns(["o_orderkey", "o_custkey", "c_mktsegment", "price_c"])


def window_tumbling(sf_dir: str):
    """Tumbling 1h event-time window per user (streaming-window analog over
    the bounded log; SURVEY.md §2.4 'bounded replays of a time window')."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("window_start", pc.floor_temporal(t["ts"], unit="hour"))
        t = t.append_column("value_c", _as_scaled_int(t["value"], 100))
        t = t.append_column("one", pa.nulls(len(t), pa.int64()).fill_null(1))
        t = t.drop_columns(["ts", "value"])
        return pa.TableGroupBy(t, ["user_id", "window_start"]).aggregate(
            [("value_c", "sum"), ("one", "sum")]
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["user_id", "window_start"]
    ).aggregate(
        Sum("one_sum", alias_name="n_events"),
        Sum("value_c_sum", alias_name="sum_value_c"),
    )


def session_windows(sf_dir: str):
    """Session windows (30-min inactivity gap) per user over the bounded
    event log — the map_groups-over-sorted-group pattern for stream-shaped
    workloads (ray_guide 'Streaming-shaped workloads'; ordering restored per
    key inside the group, as the reference restores per-shard order)."""
    import pandas as pd

    ds = _rd().read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_id", "ts", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        sess = gap.cumsum() + 1  # first row: diff NaT -> False -> session 1
        out = g.assign(session_id=sess).groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "count"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_id", "n_events", "session_start", "session_end"]]

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")


def topk_per_group(sf_dir: str):
    """Top-3 orders by price per market segment (grouped top-k via
    map_groups sort+head; ties broken by orderkey)."""
    orders = _rd().read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    import ray

    ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())))

    def tag(t: pa.Table) -> pa.Table:
        import ray as _ray

        lk = _ray.get(ref)
        seg = pa.array([lk.get(int(k)) for k in
                        t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)],
                       pa.string())
        t = t.append_column("c_mktsegment", seg)
        t = t.append_column("price_c", _as_scaled_int(t["o_totalprice"], 100))
        return t.drop_columns(["o_totalprice", "o_custkey"])

    def topk(g: pa.Table) -> pa.Table:
        g = g.sort_by([("price_c", "descending"), ("o_orderkey", "ascending")]).slice(0, 3)
        rank = pa.array(np.arange(1, len(g) + 1, dtype=np.int64))
        return g.append_column("rank", rank)

    return (orders.map_batches(tag, batch_format="pyarrow")
            .groupby("c_mktsegment").map_groups(topk, batch_format="pyarrow"))


def anti_join_inactive_customers(sf_dir: str):
    """Anti join via broadcast key set (semi/anti pattern from the Ray guide:
    broadcast the key set — or a Bloom filter of it at scale — and filter
    inside map_batches, no shuffle): customers with no events."""
    import ray

    active = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id"])
    ref = ray.put(set(pc.unique(active["user_id"]).to_pylist()))

    ds = _rd().read_parquet(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_name"])

    class AntiFilter:
        def __init__(self):
            import ray as _ray

            self.active = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = np.fromiter((int(k) not in self.active for k in keys), bool, len(keys))
            return t.filter(pa.array(keep))

    return ds.map_batches(AntiFilter, batch_format="pyarrow", concurrency=2)


def union_all_keys(sf_dir: str):
    """Dataset.union (the set-op surface): one keyed row stream from two
    tables, tagged by source."""
    a = _rd().read_parquet(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    a = a.map_batches(
        lambda t: pa.table({"key": pc.cast(t["n_nationkey"], pa.int64()),
                            "name": t["n_name"],
                            "src": pa.nulls(len(t), pa.string()).fill_null("nation")}),
        batch_format="pyarrow")
    b = _rd().read_parquet(os.path.join(sf_dir, "region.parquet"),
                           columns=["r_regionkey", "r_name"])
    b = b.map_batches(
        lambda t: pa.table({"key": pc.cast(t["r_regionkey"], pa.int64()),
                            "name": t["r_name"],
                            "src": pa.nulls(len(t), pa.string()).fill_null("region")}),
        batch_format="pyarrow")
    return a.union(b)


def global_topk_orders(sf_dir: str):
    """Global sort + limit (ds.sort is an all-to-all range sort; the small
    result gets ranks on the driver)."""
    ds = _rd().read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.append_column("price_c", _as_scaled_int(t["o_totalprice"], 100))
        .drop_columns(["o_totalprice"]),
        batch_format="pyarrow")
    top = ds.sort(["price_c", "o_orderkey"], descending=[True, False]).limit(100)
    rows = top.take_all()
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "price_c": pa.array([r["price_c"] for r in rows], pa.int64()),
        "rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
    })


def distinct_langs(sf_dir: str):
    """Distinct values (ds.unique analog — a shuffle-backed set op)."""
    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["lang"])
    vals = sorted(ds.unique("lang"))
    return pa.table({"lang": pa.array(vals, pa.string())})


# ---------------------------------------------------------------------------
# training-data ops with SQL oracles
# ---------------------------------------------------------------------------


def dedup_exact_groups(sf_dir: str):
    from ray.data.aggregate import Count, Min

    from ..functions.dedup import add_content_key

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    keyed = ds.map_batches(lambda t: add_content_key(t).drop_columns(["text"]),
                           batch_format="pyarrow")
    return keyed.groupby("content_key").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups")
    )


def token_stats(sf_dir: str):
    from ..functions.text import add_token_count

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return ds.map_batches(lambda t: add_token_count(t).drop_columns(["text"]),
                          batch_format="pyarrow")


def quality_stats(sf_dir: str):
    from ..functions.text import add_quality_signals

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_quality_signals(t).drop_columns(["text"]), batch_format="pyarrow"
    )


def knn_cosine_top5(sf_dir: str):
    from ..functions.similarity import knn_bruteforce

    ds = _rd().read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    out = knn_bruteforce(ds, query_ids=KNN_QUERY_IDS, k=KNN_K)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def embedding_dup_ids(sf_dir: str):
    from ..functions.dedup import embedding_dup_pairs

    ds = _rd().read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=EMB_DUP_THRESHOLD).select_columns(
        ["id_a", "id_b"]
    )


# ---------------------------------------------------------------------------
# non-SQL-expressible ops (driver records rows-only checks)
# ---------------------------------------------------------------------------


def minhash_dedup(sf_dir: str):
    from ..functions.dedup import minhash_dedup_pairs

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return minhash_dedup_pairs(ds, threshold=0.5)


def simhash_signatures(sf_dir: str):
    from ..functions.dedup import SimHasher

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return ds.map_batches(SimHasher(), batch_format="pyarrow").select_columns(
        ["doc_id", "simhash"]
    )


def langid_pred(sf_dir: str):
    from ..functions.text import LangId

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text", "lang"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2,
                          batch_size=1024).select_columns(["doc_id", "lang", "lang_pred"])


def doc_fingerprints(sf_dir: str):
    from ..functions.text import add_fingerprint

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    return ds.map_batches(lambda t: add_fingerprint(t).drop_columns(["text"]),
                          batch_format="pyarrow")


def knn_lsh_top5(sf_dir: str):
    from ..functions.similarity import knn_lsh

    ds = _rd().read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    return knn_lsh(ds, query_ids=KNN_QUERY_IDS[:3], k=KNN_K).select_columns(
        ["query_id", "neighbor_id", "rank"]
    )


def multimodal_features(sf_dir: str):
    """Binary-payload decode plumbing: documents.text encoded to bytes stands
    in for the image/audio payload (codec stubbed, schema/actor path real)."""
    from ..functions.multimodal import extract_features

    ds = _rd().read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    binry = ds.map_batches(
        lambda t: t.append_column("payload", pc.cast(t["text"], pa.large_binary()))
        .drop_columns(["text"]),
        batch_format="pyarrow",
    )
    return extract_features(binry, binary_col="payload", feature_dim=8, concurrency=2)
