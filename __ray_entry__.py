"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC LWW replay on sf0.001. ``queries()`` maps
every implemented operator/pipeline (SURVEY.md §2) to a callable over
``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent SQL with IDENTICAL
column names. Ray is initialised by the driver before importing this module —
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from dataxray.functions import sketches as _SK
from dataxray.pipelines import reports as R

# word-trigram shingling + exact Jaccard pair join, shared by the
# ngram_jaccard_dups oracle and the dup_clusters closure oracle
# (tokenization parity with functions/dedup.py shingles64)
_NGRAM_CTES = (
    "toks AS (SELECT doc_id, "
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w "
    "FROM documents), "
    "sh AS (SELECT doc_id, CASE "
    "WHEN len(w) = 0 THEN CAST([] AS VARCHAR[]) "
    "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
    "ELSE list_transform(range(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS g FROM toks), "
    "d AS (SELECT doc_id, list_distinct(g) AS g FROM sh WHERE len(g) > 0)"
)
_NGRAM_PAIRS_SELECT = (
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM d a JOIN d b ON a.doc_id < b.doc_id "
    "WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) "
    "/ len(list_distinct(a.g || b.g)) >= 0.7"
)


def entry() -> Any:
    """Flagship: replay the events table as a CDC change log (url-hash
    partitioned LWW upsert into an exactly-once Parquet lake) at sf0.001."""
    return R.cdc_lww_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # Gate-window rotation (round 5): the driver's correctness gate
        # evaluates the FIRST 50 entries only, so ordering is attestation
        # policy, not style. Slots 1-8: flagship CDC rows (every round).
        # Slots 9-12: this round's new/fixed rows (join view, newly
        # SQL-oracled packers, the repaired incremental MinHash index).
        # Slots 13-50: the 38 SQL-oracled queries that had never been
        # driver-checked before round 5 (they were positions 51+ in r04).
        # --- CDC engine (flagship; full replay -> lake -> final state) ---
        "cdc_lww_replay": R.cdc_lww_replay,
        "cdc_lww_salted": R.cdc_lww_salted,
        "cdc_incremental": R.cdc_incremental,
        "cdc_time_travel": R.cdc_time_travel,
        "cdc_change_feed": R.cdc_change_feed,
        "cdc_incremental_agg": R.cdc_incremental_agg,
        "cdc_incremental_window": R.cdc_incremental_window,
        "lake_predicate_scan": R.lake_predicate_scan,
        # --- round-5 new / repaired rows ---
        "cdc_incremental_join": R.cdc_incremental_join,
        "repetition_stats": R.repetition_stats,
        "pack_bins": R.pack_bins,
        "minhash_dedup_incremental": R.minhash_dedup_incremental,
        # --- SQL-oracled, first driver check this round ---
        "doc_term_rows": R.doc_term_rows,
        "collect_langs_by_source": R.collect_langs_by_source,
        "left_join_customer_orders": R.left_join_customer_orders,
        "full_outer_join_keys": R.full_outer_join_keys,
        "cumsum_user_value": R.cumsum_user_value,
        "lag_prev_value": R.lag_prev_value,
        "agg_rollup_flags": R.agg_rollup_flags,
        "mode_event_type_per_user": R.mode_event_type_per_user,
        "ntile_orders_price": R.ntile_orders_price,
        "dup_clusters": R.dup_clusters,
        "hopping_window": R.hopping_window,
        "pivot_event_counts": R.pivot_event_counts,
        "stats_moments": R.stats_moments,
        "word_count_topk": R.word_count_topk,
        "users_click_and_purchase": R.users_click_and_purchase,
        "users_click_not_purchase": R.users_click_not_purchase,
        "median_cont_by_type": R.median_cont_by_type,
        "lev1_name_pairs": R.lev1_name_pairs,
        "dup_span_stats": R.dup_span_stats,
        "dense_rank_quantity": R.dense_rank_quantity,
        "agg_cube_flags": R.agg_cube_flags,
        "tpch_q3_revenue": R.tpch_q3_revenue,
        "global_value_ranks": R.global_value_ranks,
        "global_median_price": R.global_median_price,
        "value_histogram": R.value_histogram,
        "semi_join_active_customers": R.semi_join_active_customers,
        "cross_join_region_nation": R.cross_join_region_nation,
        "argmax_event_per_user": R.argmax_event_per_user,
        "containment_dups": R.containment_dups,
        "kmv_distinct_users_by_type": R.kmv_distinct_users_by_type,
        "kmv_jaccard_click_purchase": R.kmv_jaccard_click_purchase,
        "tfidf_top_terms": R.tfidf_top_terms,
        "rolling_avg_value": R.rolling_avg_value,
        "url_host_stats": R.url_host_stats,
        "unpivot_event_measures": R.unpivot_event_measures,
        "entropy_quality": R.entropy_quality,
        "copartitioned_join_lakes": R.copartitioned_join_lakes,
        "html_text_extract": R.html_text_extract,
        # --- below the 50-query gate window ---
        # SQL-oracled round-5 additions (first in line if the window widens)
        "warc_text_extract": R.warc_text_extract,
        "cdc_warc_ingest": R.cdc_warc_ingest,
        # py-model-oracled (the driver records rows-only for these, the
        # weakest check it can give them; tools/check_correctness.py
        # value-checks them against reference_models every sweep)
        "cms_user_counts": R.cms_user_counts,
        "hll_distinct_users_by_type": R.hll_distinct_users_by_type,
        "image_resize": R.image_resize,
        "pagerank_users": R.pagerank_user_graph,
        "kmeans_clusters": R.kmeans_clusters,
        "video_frame_sample": R.video_frame_sample,
        "bfs_hops_from_hub": R.bfs_hops_from_hub,
        # previously driver-green (CORRECTNESS_r01-r04 hash rows exist)
        "dx_substr": R.dx_substr_part,
        "dx_pad": R.dx_pad_nation,
        "dx_replace": R.dx_replace_customer,
        "dx_filter_like": R.dx_filter_like_docs,
        "dx_filter_cmp": R.dx_filter_cmp_lineitem,
        "dx_digest": R.dx_digest_docs,
        "transform_chain": R.transform_chain_docs,
        "const_and_prune": R.const_and_prune,
        "column_cast": R.column_cast,
        "error_split_valid": R.error_split_valid,
        "range_split": R.range_split_orders,
        "rdbms_roundtrip": R.rdbms_roundtrip,
        "cli_job_roundtrip": R.cli_job_roundtrip,
        "agg_pricing_summary": R.agg_pricing_summary,
        "broadcast_join_segments": R.broadcast_join_segments,
        "hash_join_order_rows": R.hash_join_order_rows,
        "window_tumbling": R.window_tumbling,
        "session_windows": R.session_windows,
        "topk_per_group": R.topk_per_group,
        "distinct_langs": R.distinct_langs,
        "anti_join_inactive_customers": R.anti_join_inactive_customers,
        "anti_join_bloom": R.anti_join_bloom,
        "union_all_keys": R.union_all_keys,
        "global_topk_orders": R.global_topk_orders,
        "asof_prev_event": R.asof_prev_event,
        "interval_join_windows": R.interval_join_windows,
        "interval_join_windows_tb": R.interval_join_windows_tb,
        "dedup_exact_groups": R.dedup_exact_groups,
        "token_stats": R.token_stats,
        "quality_stats": R.quality_stats,
        "pii_redact": R.pii_redact,
        "knn_cosine_top5": R.knn_cosine_top5,
        "embedding_dup_ids": R.embedding_dup_ids,
        "ngram_jaccard_dups": R.ngram_jaccard_dups,
        "langid_pred": R.langid_pred,
        "quantiles_price_by_priority": R.quantiles_price_by_priority,
        "sample_hash_events": R.sample_hash_events,
        "stratified_sample_events": R.stratified_sample_events,
        "hll_distinct_users": R.hll_distinct_users,
        "json_extract_props": R.json_extract_props,
        # previously driver-checked rows-only (py-model oracles)
        "minhash_dedup": R.minhash_dedup,
        "simhash_signatures": R.simhash_signatures,
        "doc_fingerprints": R.doc_fingerprints,
        "knn_lsh_top5": R.knn_lsh_top5,
        "knn_ivf_top5": R.knn_ivf_top5,
        "multimodal_features": R.multimodal_features,
    }


_CDC_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, ts AS warc_ts, props AS text,
         event_type AS lang, event_type
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
  FROM ev
)
SELECT url, txn_id, warc_ts, text, lang
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""

_TT_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, ts AS warc_ts, props AS text,
         event_type AS lang, event_type
  FROM events
), thr AS (SELECT max(event_id) // 2 AS t FROM events),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
  FROM ev WHERE txn_id <= (SELECT t FROM thr)
)
SELECT url, txn_id, warc_ts, text, lang
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""

# change feed = diff of the two LWW snapshots (epoch-1 vs full); a key is an
# update exactly when its winning txn moved; deletes carry the OLD payload
_CDF_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, ts AS warc_ts, props AS text,
         event_type AS lang, event_type
  FROM events
), thr AS (SELECT max(event_id) // 2 AS t FROM events),
old AS (
  SELECT url, txn_id, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM ev WHERE txn_id <= (SELECT t FROM thr)
  ) WHERE rn = 1 AND event_type <> 'error'
), new AS (
  SELECT url, txn_id, warc_ts, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT coalesce(n.url, o.url) AS url,
       CASE WHEN o.url IS NULL THEN 'insert'
            WHEN n.url IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       CASE WHEN n.url IS NULL THEN o.txn_id ELSE n.txn_id END AS txn_id,
       CASE WHEN n.url IS NULL THEN o.warc_ts ELSE n.warc_ts END AS warc_ts,
       CASE WHEN n.url IS NULL THEN o.text ELSE n.text END AS text,
       CASE WHEN n.url IS NULL THEN o.lang ELSE n.lang END AS lang
FROM new n FULL OUTER JOIN old o ON n.url = o.url
WHERE o.url IS NULL OR n.url IS NULL OR n.txn_id <> o.txn_id
"""

# incremental derivation oracle: the Ray side maintains the aggregate from
# the epoch-1 snapshot + the pre-image change feed; the oracle recomputes it
# from scratch over the FINAL LWW snapshot — equality proves the algebra
_INC_AGG_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, props AS text, event_type AS lang, event_type
  FROM events
), new AS (
  SELECT url, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS sum_len
FROM new GROUP BY lang ORDER BY lang
"""

_INC_WIN_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, ts AS warc_ts, props AS text, event_type
  FROM events
), new AS (
  SELECT warc_ts, text FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT CAST(epoch_us(warc_ts) // 21600000000 AS BIGINT) AS window,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS sum_len
FROM new GROUP BY 1 ORDER BY 1
"""

# join-view oracle: both sides' FINAL LWW states re-joined from scratch —
# equality proves the CDF-maintained join view's algebra. B's WAL maps
# signup→I, error→D, else U over the same url keys (payload = value cents
# as text), so both sides' survivors are the non-error LWW winners.
_INC_JOIN_SQL = """
WITH ev AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id, props AS text, event_type AS lang, event_type
  FROM events
), a AS (
  SELECT url, text, lang FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND event_type <> 'error'
), evb AS (
  SELECT 'https://user' || CAST(user_id AS VARCHAR) AS url,
         event_id AS txn_id,
         CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) AS text,
         event_type
  FROM events
), b AS (
  SELECT url, text FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY txn_id DESC) AS rn
    FROM evb
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT a.lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(COALESCE(length(a.text), 0) + COALESCE(length(b.text), 0))
            AS BIGINT) AS sum_len
FROM a JOIN b ON a.url = b.url GROUP BY a.lang ORDER BY a.lang
"""

_N_TOKENS = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)

# Gopher-style repetition signals (functions/text.add_repetition_signals)
# as pure SQL: duplicate-line fractions from per-(doc, line) counts, the
# top word-2-gram by (count, (a, b)) with the pair tie-break encoded as
# lexicographic order of a || chr(1) || b (tokens never contain \x01).
_REPETITION_SQL = """
WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
ln AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM base),
lc AS (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS c FROM ln
       WHERE regexp_matches(line, '\\S') GROUP BY 1, 2),
ls AS (SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS dup_lines,
       sum(length(line) * (c - 1)) AS dup_chars,
       sum(length(line) * c) AS tot_chars FROM lc GROUP BY 1),
w AS (SELECT doc_id,
      list_filter(regexp_split_to_array(t, '\\s+'), x -> x <> '') AS w
      FROM base),
gr AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
       i -> w[i] || chr(1) || w[i+1])) AS g FROM w WHERE len(w) >= 2),
gc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM gr GROUP BY 1, 2),
tp AS (SELECT doc_id, g, c FROM (SELECT doc_id, g, c, row_number() OVER
       (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn FROM gc)
       WHERE rn = 1),
tl AS (SELECT doc_id,
       list_aggregate(list_transform(w, x -> length(x)), 'sum') AS total
       FROM w)
SELECT b.doc_id,
  coalesce(CAST(ls.dup_lines AS DOUBLE) / ls.n_lines, 0.0) AS dup_line_frac,
  coalesce(CASE WHEN ls.tot_chars > 0
           THEN CAST(ls.dup_chars AS DOUBLE) / ls.tot_chars ELSE 0.0 END,
           0.0) AS dup_line_char_frac,
  coalesce(least(CAST((length(tp.g) - 1) * tp.c AS DOUBLE) / tl.total, 1.0),
           0.0) AS top2gram_char_frac
FROM base b LEFT JOIN ls USING (doc_id) LEFT JOIN tp USING (doc_id)
LEFT JOIN tl USING (doc_id)
"""


def _pack_bins_sql() -> str:
    """Greedy next-fit packing (functions/text.pack_sequences) replayed in
    SQL: the bucket hash is (doc_id * 0x9E3779B97F4A7C15 mod 2^64) >> 33
    mod 16 in HUGEINT limb arithmetic, and each bucket's sequential
    next-fit state machine ((k, used) -> bin) advances one ordered doc per
    recursive-CTE iteration."""
    h = _SK._mulmod_sql("CAST(doc_id AS HUGEINT)", 0x9E3779B97F4A7C15)
    bucket = f"CAST(({h}) // 8589934592 % 16 AS BIGINT)"
    moved = "s.un > 0 AND s.un + o.n_tokens > 256"
    u1 = f"(CASE WHEN {moved} THEN 0 ELSE s.un END) + o.n_tokens"
    return f"""
WITH RECURSIVE base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST({_N_TOKENS} AS BIGINT) AS n_tokens FROM documents),
sized AS (SELECT doc_id, n_tokens, {bucket} AS bucket FROM base),
ord AS (SELECT doc_id, n_tokens, bucket, CAST(row_number() OVER
        (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS rn FROM sized),
st(bucket, rn, doc_id, n_tokens, bin, kn, un) AS (
  SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin,
         CAST(CASE WHEN n_tokens >= 256 THEN 1 ELSE 0 END AS BIGINT) AS kn,
         CAST(CASE WHEN n_tokens >= 256 THEN 0 ELSE n_tokens END
              AS BIGINT) AS un
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
         s.kn + CASE WHEN {moved} THEN 1 ELSE 0 END,
         s.kn + CASE WHEN {moved} THEN 1 ELSE 0 END
              + CASE WHEN {u1} >= 256 THEN 1 ELSE 0 END,
         CASE WHEN {u1} >= 256 THEN 0 ELSE {u1} END
  FROM st s JOIN ord o ON o.bucket = s.bucket AND o.rn = s.rn + 1)
SELECT doc_id, n_tokens,
       CAST(bucket * 4294967296 + bin AS BIGINT) AS bin_id FROM st
"""


def _langid_sql() -> str:
    """Stopword-argmax language ID as SQL, built from the same stopword sets
    the engine uses (first-lang-wins tie-breaking in dict order)."""
    from dataxray.functions.text import _STOPWORDS

    langs = list(_STOPWORDS)
    hx = {}
    for lang, words in _STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in sorted(words))
        hx[lang] = (
            "len(list_filter(regexp_split_to_array(lower(text), "
            f"'[^a-z0-9_'']+'), x -> x IN ({lst})))"
        )
    hits = ", ".join(f"{hx[lang]} AS {lang}" for lang in langs)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{lang} > 0"]
        conds += [f"{lang} > {o}" for o in langs[:i]]  # must beat earlier langs
        conds += [f"{lang} >= {o}" for o in langs[i + 1:]]  # ties beat later
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return (
        f"WITH h AS (SELECT doc_id, lang, {hits} FROM documents) "
        f"SELECT doc_id, lang, CASE {' '.join(cases)} ELSE 'und' END AS lang_pred "
        "FROM h"
    )


def reference_models() -> dict[str, Callable[[str], Any]]:
    """Single-process Python/numpy reference models for the deterministic
    queries DuckDB cannot express (crc32/blake2b hashing, LSH bucketing).
    tools/check_correctness.py compares these with the same row/schema/value
    rigor as the SQL oracles; the driver's own gate still records rows-only
    for these names."""
    from dataxray import oracle_models as M

    return {
        "minhash_dedup": M.minhash_dedup,
        # same full-recompute model: the incremental epochs must union to it
        "minhash_dedup_incremental": M.minhash_dedup,
        "simhash_signatures": M.simhash_signatures,
        "doc_fingerprints": M.doc_fingerprints,
        "knn_lsh_top5": M.knn_lsh_top5,
        "knn_ivf_top5": M.knn_ivf_top5,
        "multimodal_features": M.multimodal_features,
        "image_resize": M.image_resize,
        # repetition_stats / pack_bins graduated to SQL oracles (round 5);
        # their py-models stay in oracle_models.py as a second witness,
        # exercised by tests/test_entry.py::test_sql_graduates_match_pymodel
        "hll_distinct_users": M.hll_distinct_users,
        "cms_user_counts": M.cms_user_counts,
        "hll_distinct_users_by_type": M.hll_distinct_users_by_type,
        "pagerank_users": M.pagerank_users,
        "kmeans_clusters": M.kmeans_clusters,
        "video_frame_sample": M.video_frame_sample,
        "bfs_hops_from_hub": M.bfs_hops_from_hub,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_lww_replay": _CDC_SQL,
        "cdc_lww_salted": _CDC_SQL,
        "cdc_incremental": _CDC_SQL,
        "cdc_time_travel": _TT_SQL,
        "cdc_change_feed": _CDF_SQL,
        "cdc_incremental_agg": _INC_AGG_SQL,
        "cdc_incremental_window": _INC_WIN_SQL,
        "cdc_incremental_join": _INC_JOIN_SQL,
        "lake_predicate_scan": (
            _CDC_SQL + " AND url >= 'https://user2' AND url < 'https://user7'"
        ),
        "dx_substr": "SELECT p_partkey, substr(p_name, 3, 8) AS p_sub FROM part",
        "dx_pad": "SELECT n_nationkey, lpad(n_name, 12, '*') AS n_padded FROM nation",
        "dx_replace": (
            "SELECT c_custkey, substr(c_name, 1, 2) || 'XX' || substr(c_name, 7) "
            "AS c_redacted FROM customer"
        ),
        "dx_filter_like": (
            "SELECT doc_id, lang FROM documents "
            "WHERE lang IS NULL OR NOT regexp_full_match(lang, 'en|de')"
        ),
        "dx_filter_cmp": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_quantity IS NULL OR NOT (l_quantity > 25)"
        ),
        "dx_digest": "SELECT doc_id, md5(text) AS text_digest FROM documents",
        "transform_chain": (
            "SELECT doc_id, md5(substr(text, 1, 20)) AS text FROM documents "
            "WHERE lang IS NULL OR NOT regexp_full_match(lang, 'en')"
        ),
        "const_and_prune": "SELECT c_custkey, c_name, 'dataxray' AS src FROM customer",
        "column_cast": (
            "SELECT event_id, CAST(event_id AS VARCHAR) AS id_str, "
            "strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM events"
        ),
        "error_split_valid": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE value IS NULL OR NOT (value > 40)"
        ),
        "rdbms_roundtrip": (
            "SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN 'REDACTED' "
            "ELSE c_name END AS c_name FROM customer"
        ),
        "cli_job_roundtrip": (
            "SELECT CAST(c_custkey AS BIGINT) AS key, substr(c_name, 1, 8) AS val, "
            "'customer' AS src FROM customer "
            "UNION ALL SELECT CAST(n_nationkey AS BIGINT), lpad(n_name, 12, '*'), "
            "'nation' FROM nation"
        ),
        "range_split": (
            "WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi FROM orders) "
            "SELECT ((o_orderkey - lo) * 8) // (hi - lo + 1) AS range_id, "
            "count(*) AS n_rows, min(o_orderkey) AS key_lo, max(o_orderkey) AS key_hi "
            "FROM orders, b GROUP BY 1"
        ),
        # monetary sums are exact fixed-point (per-row round to cents / 1e-4,
        # then integer sums) so both engines produce bit-identical values
        "agg_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_c, "
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) "
            "AS BIGINT) AS sum_disc_e4, count(*) AS n_rows FROM lineitem GROUP BY 1, 2"
        ),
        "broadcast_join_segments": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_c "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
        ),
        "hash_join_order_rows": (
            "SELECT o_orderkey, o_custkey, c_mktsegment, "
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c "
            "FROM orders JOIN customer ON o_custkey = c_custkey"
        ),
        "window_tumbling": (
            "SELECT user_id, date_trunc('hour', ts) AS window_start, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_c "
            "FROM events GROUP BY 1, 2"
        ),
        "session_windows": (
            "WITH d AS (SELECT user_id, event_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, CAST(sum(new_sess) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM d) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "min(ts) AS session_start, max(ts) AS session_end "
            "FROM s GROUP BY 1, 2"
        ),
        "topk_per_group": (
            "WITH t AS (SELECT o_orderkey, c_mktsegment, "
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c, "
            "CAST(row_number() OVER (PARTITION BY c_mktsegment "
            "ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey) "
            "AS BIGINT) AS rank "
            "FROM orders JOIN customer ON o_custkey = c_custkey) "
            "SELECT o_orderkey, c_mktsegment, price_c, rank FROM t WHERE rank <= 3"
        ),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "anti_join_inactive_customers": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT user_id FROM events)"
        ),
        "anti_join_bloom": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT user_id FROM events)"
        ),
        "union_all_keys": (
            "SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS name, "
            "'nation' AS src FROM nation "
            "UNION ALL SELECT CAST(r_regionkey AS BIGINT), r_name, 'region' FROM region"
        ),
        "global_topk_orders": (
            "SELECT o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c, "
            "CAST(row_number() OVER (ORDER BY "
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey) AS BIGINT) "
            "AS rank FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 100"
        ),
        "dedup_exact_groups": (
            "SELECT md5(text) AS content_key, min(doc_id) AS keep_id, "
            "count(*) AS n_dups FROM documents GROUP BY 1"
        ),
        "token_stats": f"SELECT doc_id, {_N_TOKENS} AS n_tokens FROM documents",
        # same RE2 patterns as functions/text.py PII_EMAIL / PII_URL —
        # pyarrow and DuckDB both run RE2, so the strings match exactly
        "pii_redact": (
            "SELECT doc_id, regexp_replace(regexp_replace("
            "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)"
            " || '@example.com see https://ex.com/p/' || "
            "CAST(doc_id AS VARCHAR) || ' end', "
            r"'[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g'), 'https?://[^\\s]+', '<URL>', 'g') "
            "AS text_redacted FROM documents"
        ),
        "quality_stats": (
            "SELECT doc_id, length(text) AS n_chars_calc, "
            f"{_N_TOKENS} AS n_tokens, "
            "CASE WHEN length(text) > 0 THEN "
            "CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)"
            " / length(text) ELSE 0.0 END AS punct_ratio, "
            f"CASE WHEN {_N_TOKENS} > 0 THEN "
            f"CAST(length(text) AS DOUBLE) / ({_N_TOKENS}) ELSE 0.0 END AS mean_token_len "
            "FROM documents"
        ),
        "knn_cosine_top5": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
            "FROM embeddings WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9)), "
            "s AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id) "
            "SELECT query_id, neighbor_id, CAST(row_number() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank "
            "FROM s QUALIFY rank <= 5"
        ),
        "langid_pred": _langid_sql(),
        "repetition_stats": _REPETITION_SQL,
        "pack_bins": _pack_bins_sql(),
        "embedding_dup_ids": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.3"
        ),
        "asof_prev_event": (
            "SELECT a.event_id, b.event_id AS prev_event_id, "
            "date_diff('microsecond', b.ts, a.ts) AS gap_us "
            "FROM events a ASOF LEFT JOIN events b "
            "ON a.user_id = b.user_id AND b.ts < a.ts"
        ),
        "interval_join_windows": (
            "SELECT a.event_id, b.event_id AS window_id "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.value > 100 AND a.ts >= b.ts "
            "AND a.ts < b.ts + INTERVAL 60 MINUTE "
            "AND a.event_id <> b.event_id"
        ),
        # same oracle, different distribution strategy (time-bucketed)
        "interval_join_windows_tb": (
            "SELECT a.event_id, b.event_id AS window_id "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.value > 100 AND a.ts >= b.ts "
            "AND a.ts < b.ts + INTERVAL 60 MINUTE "
            "AND a.event_id <> b.event_id"
        ),
        # word-trigram Jaccard with the same tokenization (whitespace split,
        # drop empties) and k<3 fallback (whole text as one shingle) as
        # functions/dedup.py shingles64
        "ngram_jaccard_dups": f"WITH {_NGRAM_CTES} {_NGRAM_PAIRS_SELECT}",
        # duplicate clusters = transitive closure of the same pairs
        # (recursive CTE; UNION-distinct terminates on cycles)
        "dup_clusters": (
            f"WITH RECURSIVE {_NGRAM_CTES}, "
            f"pairs AS ({_NGRAM_PAIRS_SELECT}), "
            "und AS (SELECT id_a AS u, id_b AS v FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach(u, v) AS (SELECT u, v FROM und "
            "UNION SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u) "
            "SELECT u AS doc_id, least(u, min(v)) AS rep "
            "FROM reach GROUP BY u"
        ),
        # discrete quantiles (actual elements, bit-exact) on price cents
        "quantiles_price_by_priority": (
            "SELECT o_orderpriority, "
            "quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.25) AS p25_c, "
            "quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.50) AS p50_c, "
            "quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.75) AS p75_c, "
            "quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.95) AS p95_c, "
            "count(*) AS n_rows FROM orders GROUP BY o_orderpriority"
        ),
        # deterministic Bernoulli sample: splitmix64 reproduced in SQL via
        # HUGEINT 32-bit-limb arithmetic (functions/sketches.splitmix64_sql)
        "sample_hash_events": (
            "SELECT event_id, user_id, event_type FROM events "
            f"WHERE {_SK.sample_threshold_sql('event_id', 0.1)}"
        ),
        "stratified_sample_events": (
            "SELECT event_type, event_id, user_id FROM ("
            "SELECT event_type, event_id, user_id, row_number() OVER ("
            "PARTITION BY event_type "
            f"ORDER BY {_SK.splitmix64_sql('event_id')}, event_id) AS rn "
            "FROM events) WHERE rn <= 50"
        ),
        "json_extract_props": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') "
            "AS BIGINT) AS k FROM events"
        ),
        "doc_term_rows": (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS term "
            "FROM documents WHERE doc_id < 50"
        ),
        "collect_langs_by_source": (
            "SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs, "
            "count(*) AS n_langs FROM "
            "(SELECT DISTINCT source, lang FROM documents) GROUP BY source"
        ),
        "left_join_customer_orders": (
            "SELECT c_custkey, c_mktsegment, "
            "coalesce(o_orderkey, -1) AS o_orderkey_f "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey"
        ),
        "full_outer_join_keys": (
            "WITH m AS (SELECT max(c_custkey) AS mx FROM customer), "
            "c AS (SELECT c_custkey, c_nationkey FROM customer, m "
            "WHERE c_custkey <= (mx * 2) // 3), "
            "o AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) "
            "AS BIGINT)) AS BIGINT) AS spend_c FROM orders, m "
            "WHERE o_custkey >= mx // 3 GROUP BY o_custkey) "
            "SELECT coalesce(c_custkey, o_custkey) AS custkey, "
            "coalesce(c_nationkey, -1) AS nationkey_f, "
            "coalesce(spend_c, -1) AS spend_c_f "
            "FROM c FULL OUTER JOIN o ON c_custkey = o_custkey"
        ),
        "cumsum_user_value": (
            "SELECT event_id, user_id, "
            "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS running_c FROM events"
        ),
        "lag_prev_value": (
            "SELECT event_id, user_id, "
            "coalesce(lag(CAST(round(value * 100, 0) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id), -1) "
            "AS prev_value_c FROM events"
        ),
        "agg_rollup_flags": (
            "SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag, "
            "coalesce(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) "
            "AS BIGINT) AS rev_c, count(*) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "mode_event_type_per_user": (
            "SELECT user_id, event_type AS mode_type, cnt AS mode_count "
            "FROM (SELECT user_id, event_type, count(*) AS cnt, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "ntile_orders_price": (
            "SELECT o_orderkey, o_orderpriority, "
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c, "
            "ntile(4) OVER (PARTITION BY o_orderpriority "
            "ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC, "
            "o_orderkey) AS tile FROM orders"
        ),
        "hopping_window": (
            "SELECT user_id, make_timestamp("
            "(epoch_us(ts) // 900000000) * 900000000 - i * 900000000) "
            "AS window_start, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS sum_value_c "
            "FROM events CROSS JOIN range(4) r(i) GROUP BY 1, 2"
        ),
        "pivot_event_counts": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n_{et}"
                for et in ("click", "error", "purchase", "signup", "view"))
            + " FROM events GROUP BY 1"
        ),
        "stats_moments": (
            "WITH b AS (SELECT l_returnflag, "
            "CAST(round(l_quantity, 0) AS BIGINT) AS q, "
            "CAST(round(l_tax * 100, 0) AS BIGINT) AS x FROM lineitem), "
            "s AS (SELECT l_returnflag, count(*) AS n, sum(q) AS sq, "
            "sum(q*q) AS sqq, sum(x) AS st, sum(q*x) AS sqt "
            "FROM b GROUP BY 1) "
            "SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, "
            "CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty, "
            "CAST(n*sqq - sq*sq AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) "
            "AS var_qty, "
            "CAST(n*sqt - sq*st AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) "
            "AS cov_qty_tax FROM s"
        ),
        "word_count_topk": (
            "WITH toks AS (SELECT unnest(list_filter("
            "regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token "
            "FROM documents) "
            "SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks "
            "GROUP BY token ORDER BY cnt DESC, token LIMIT 50"
        ),
        "users_click_and_purchase": (
            "SELECT user_id, date_trunc('hour', ts) AS hr FROM events "
            "WHERE event_type = 'click' "
            "INTERSECT "
            "SELECT user_id, date_trunc('hour', ts) AS hr FROM events "
            "WHERE event_type = 'purchase'"
        ),
        "users_click_not_purchase": (
            "SELECT user_id, date_trunc('hour', ts) AS hr FROM events "
            "WHERE event_type = 'click' "
            "EXCEPT "
            "SELECT user_id, date_trunc('hour', ts) AS hr FROM events "
            "WHERE event_type = 'purchase'"
        ),
        "median_cont_by_type": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100, 0) AS BIGINT) AS value_c FROM events), "
            "r AS (SELECT event_type, value_c, "
            "row_number() OVER (PARTITION BY event_type ORDER BY value_c) "
            "AS rn, count(*) OVER (PARTITION BY event_type) AS n FROM v) "
            "SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows, "
            "avg(CASE WHEN rn = (n+1)//2 OR rn = n//2 + 1 "
            "THEN CAST(value_c AS DOUBLE) END) AS median_c "
            "FROM r GROUP BY 1"
        ),
        "dup_span_stats": (
            "WITH toks AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') "
            "AS w FROM documents), "
            "spans AS (SELECT doc_id, unnest(list_distinct(list_transform("
            "range(1, len(w) - 3), i -> w[i] || ' ' || w[i+1] || ' ' || "
            "w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS span "
            "FROM toks WHERE len(w) >= 5), "
            "cnt AS (SELECT span, count(*) AS nd FROM spans GROUP BY 1) "
            "SELECT s.doc_id, count(*) AS n_spans, "
            "CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_spans FROM spans s JOIN cnt c USING (span) GROUP BY 1"
        ),
        "dense_rank_quantity": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(dense_rank() OVER (PARTITION BY l_returnflag "
            "ORDER BY CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) "
            "AS qty_rank FROM lineitem"
        ),
        "agg_cube_flags": (
            "SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag, "
            "coalesce(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) "
            "AS BIGINT) AS rev_c, count(*) AS n_rows "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "tpch_q3_revenue": (
            "SELECT l_orderkey, o_orderdate, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) "
            "AS rev_c4 "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY 1, 2 ORDER BY rev_c4 DESC, l_orderkey LIMIT 10"
        ),
        "global_value_ranks": (
            "SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) "
            "AS value_c, row_number() OVER (ORDER BY "
            "CAST(round(value * 100, 0) AS BIGINT), event_id) AS rank "
            "FROM events"
        ),
        "global_median_price": (
            "WITH v AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) "
            "AS price_c FROM orders), "
            "r AS (SELECT price_c, row_number() OVER (ORDER BY price_c) "
            "AS rn, count(*) OVER () AS n FROM v) "
            "SELECT CAST(max(n) AS BIGINT) AS n_rows, "
            "avg(CASE WHEN rn = (n+1)//2 OR rn = n//2 + 1 "
            "THEN CAST(price_c AS DOUBLE) END) AS median_price_c FROM r"
        ),
        "value_histogram": (
            "SELECT CAST(round(value * 100, 0) AS BIGINT) // 500 AS bin, "
            "count(*) AS n FROM events GROUP BY 1"
        ),
        "semi_join_active_customers": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_totalprice > 450000)"
        ),
        "cross_join_region_nation": (
            "SELECT r_regionkey, r_name, n_nationkey, n_name "
            "FROM region CROSS JOIN nation"
        ),
        "argmax_event_per_user": (
            "SELECT user_id, event_id AS best_event_id, "
            "value_c AS best_value_c FROM ("
            "SELECT user_id, event_id, "
            "CAST(round(value * 100, 0) AS BIGINT) AS value_c, "
            "row_number() OVER (PARTITION BY user_id ORDER BY "
            "CAST(round(value * 100, 0) AS BIGINT) DESC, event_id) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "containment_dups": (
            "WITH " + _NGRAM_CTES + " "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g) "
            "AS containment "
            "FROM d a JOIN d b ON a.doc_id <> b.doc_id "
            "WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) "
            "/ len(a.g) >= 0.8"
        ),
        "lev1_name_pairs": (
            "WITH d AS (SELECT DISTINCT p_name FROM part) "
            "SELECT a.p_name AS name_a, b.p_name AS name_b "
            "FROM d a JOIN d b ON a.p_name < b.p_name "
            "WHERE levenshtein(a.p_name, b.p_name) = 1"
        ),
        # KMV bottom-k sketches, reproduced exactly: splitmix64 in HUGEINT
        # limb arithmetic + row_number bottom-k (functions/sketches.py)
        "kmv_distinct_users_by_type": (
            "WITH h AS (SELECT DISTINCT event_type, "
            f"{_SK.splitmix64_sql('user_id')} AS h FROM events), "
            "r AS (SELECT event_type, h, row_number() OVER "
            "(PARTITION BY event_type ORDER BY h) AS rn FROM h), "
            "s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_k, "
            "max(h) AS kth_h FROM r WHERE rn <= 64 GROUP BY event_type) "
            "SELECT event_type, n_k, kth_h, "
            "CASE WHEN n_k < 64 THEN CAST(n_k AS DOUBLE) "
            "ELSE 63.0 / (CAST(kth_h AS DOUBLE) / 18446744073709551616.0) "
            "END AS est_distinct FROM s"
        ),
        "kmv_jaccard_click_purchase": (
            "WITH h AS (SELECT DISTINCT event_type, "
            f"{_SK.splitmix64_sql('user_id')} AS h FROM events "
            "WHERE event_type IN ('click', 'purchase')), "
            "r AS (SELECT event_type, h, row_number() OVER "
            "(PARTITION BY event_type ORDER BY h) AS rn FROM h), "
            "sk AS (SELECT event_type, h FROM r WHERE rn <= 64), "
            "u AS (SELECT h, row_number() OVER (ORDER BY h) AS rn "
            "FROM (SELECT DISTINCT h FROM sk)), "
            "uk AS (SELECT h FROM u WHERE rn <= 64), "
            "m AS (SELECT CAST(count(*) AS BIGINT) AS n_match FROM uk "
            "WHERE h IN (SELECT h FROM sk WHERE event_type = 'click') "
            "AND h IN (SELECT h FROM sk WHERE event_type = 'purchase')), "
            "nu AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM uk) "
            "SELECT n_match, n_union, "
            "CAST(n_match AS DOUBLE) / n_union AS jaccard_est FROM m, nu"
        ),
        "tfidf_top_terms": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split(coalesce(text, ''), ' ')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM tok GROUP BY doc_id, term), "
            "df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM tok GROUP BY term), "
            "s AS (SELECT tf.doc_id, tf.term, tf.tf * "
            "ln((SELECT count(*) FROM documents) * 1.0 / df.df) AS tfidf "
            "FROM tf JOIN df USING (term)), "
            "r AS (SELECT doc_id, term, tfidf, CAST(row_number() OVER "
            "(PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) "
            "AS rk FROM s) "
            "SELECT doc_id, term, tfidf, rk FROM r WHERE rk <= 3"
        ),
        "rolling_avg_value": (
            "SELECT event_id, user_id, AVG(value) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_avg "
            "FROM events"
        ),
        "url_host_stats": (
            "WITH u AS (SELECT 'HTTPS://WWW.Site' || "
            "CAST(user_id % 7 AS VARCHAR) || '.COM:443/p/' || "
            "CAST(event_id AS VARCHAR) || '/?utm_source=x&id=' || "
            "CAST(event_id % 5 AS VARCHAR) || '#frag' AS url FROM events), "
            "c AS (SELECT regexp_replace(regexp_replace(url, '#.*$', ''), "
            "'[?&]utm_[^&#]*', '') AS fu FROM u), "
            "h AS (SELECT regexp_replace(regexp_replace(lower("
            "regexp_replace(fu, '^([A-Za-z]+)://([^/]+).*$', "
            "'\\1://\\2')), ':443$', ''), "
            "'^https://www\\.', 'https://') AS head FROM c) "
            "SELECT regexp_replace(head, '^https://', '') AS host, "
            "CAST(count(*) AS BIGINT) AS n_pages FROM h GROUP BY host"
        ),
        "unpivot_event_measures": (
            "SELECT event_id, 'value' AS measure, "
            "CAST(value AS DOUBLE) AS val FROM events "
            "UNION ALL SELECT event_id, 'user_id' AS measure, "
            "CAST(user_id AS DOUBLE) AS val FROM events"
        ),
        "copartitioned_join_lakes": (
            "WITH ev AS (SELECT 'https://user' || CAST(user_id AS VARCHAR) "
            "AS url, event_id AS txn_id, props AS text, "
            "event_type AS lang, event_type, "
            "CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR) "
            "AS text_b FROM events), "
            "ranked AS (SELECT *, row_number() OVER (PARTITION BY url "
            "ORDER BY txn_id DESC) AS rn FROM ev) "
            "SELECT url, txn_id, lang, text, text_b FROM ranked "
            "WHERE rn = 1 AND event_type <> 'error'"
        ),
        "html_text_extract": (
            "SELECT doc_id, trim(regexp_replace("
            "'t ' || coalesce(text, '') || ' footer', '\\s+', ' ', 'g')) "
            "AS extracted FROM documents"
        ),
        # same byte-inverting oracle: the WARC transport must be lossless
        "warc_text_extract": (
            "SELECT doc_id, trim(regexp_replace("
            "'t ' || coalesce(text, '') || ' footer', '\\s+', ' ', 'g')) "
            "AS extracted FROM documents"
        ),
        # WARC crawl -> lake: later crawl of a url wins (txn = us fetch
        # time = epoch(2020-01-01) + event_id seconds); text inverts the
        # page wrapping byte-wise
        "cdc_warc_ingest": (
            "WITH ev AS (SELECT 'https://user' || CAST(user_id AS VARCHAR) "
            "AS url, CAST(1577836800000000 + event_id * 1000000 AS BIGINT) "
            "AS txn_id, event_id, props FROM events), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY url "
            "ORDER BY event_id DESC) AS rn FROM ev) "
            "SELECT url, txn_id, trim(regexp_replace("
            "'t ' || coalesce(props, '') || ' footer', '\\s+', ' ', 'g')) "
            "AS text FROM r WHERE rn = 1"
        ),
        "entropy_quality": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split(coalesce(text, ''), ' ')) AS term "
            "FROM documents), "
            "c AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c "
            "FROM tok GROUP BY doc_id, term), "
            "n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id) "
            "SELECT c.doc_id, -sum((c * 1.0 / n) * log2(c * 1.0 / n)) "
            "AS entropy FROM c JOIN n USING (doc_id) GROUP BY c.doc_id"
        ),
    }
