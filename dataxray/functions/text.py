"""Text-analysis operators for large-scale training-data pipelines.

These extend the reference's per-record transform surface (SURVEY.md §2.1)
with the document-level ops a 100 TB web-text pipeline needs: token counting,
quality scoring, language ID, and document fingerprinting. All are
batch-vectorized (pyarrow.compute / numpy); language ID keeps its compiled
state in an actor (__init__ once per actor, __call__ per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"
_PUNCT_CLASS = r"[.!?,;:]"


def token_count(arr: pa.ChunkedArray) -> pa.Array:
    """Whitespace-separated token count; ''/null → 0.

    Mirrors: CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '\\s+')) END (the DuckDB oracle)."""
    s = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    n = pc.list_value_length(pc.split_pattern_regex(s, _WS))
    return pc.if_else(pc.equal(s, ""), pa.scalar(0, pa.int32()), n).combine_chunks() \
        if isinstance(n, pa.ChunkedArray) else pc.if_else(pc.equal(s, ""), pa.scalar(0, pa.int32()), n)


def add_token_count(batch: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    return batch.append_column(out, pc.cast(token_count(batch[col]), pa.int64()))


def add_quality_signals(batch: pa.Table, col: str = "text") -> pa.Table:
    """Length / punctuation / mean-token-length quality signals, all
    derivable in ANSI SQL for the oracle."""
    s = pc.fill_null(batch[col], "")
    n_chars = pc.cast(pc.utf8_length(s), pa.int64())
    n_tokens = pc.cast(token_count(batch[col]), pa.int64())
    n_punct = pc.cast(
        pc.list_value_length(pc.split_pattern_regex(s, _PUNCT_CLASS)), pa.int64()
    )
    n_punct = pc.subtract(n_punct, 1)  # k splits = k-1 separators
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0),
    )
    mean_tok_len = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(pc.cast(n_chars, pa.float64()), pc.cast(n_tokens, pa.float64())),
        pa.scalar(0.0),
    )
    for name, col_arr in [("n_chars_calc", n_chars), ("n_tokens", n_tokens),
                          ("punct_ratio", punct_ratio), ("mean_token_len", mean_tok_len)]:
        batch = batch.append_column(name, col_arr)
    return batch


# Tiny per-language stopword lists for the n-gram/stopword heuristic language
# identifier — intentionally small; a real deployment would broadcast a model.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "es", "un", "una", "para", "que", "con", "por"},
    "pt": {"o", "a", "os", "as", "é", "um", "uma", "para", "com", "não"},
}


class LangId:
    """Actor-pool language identifier: stopword-hit scoring per language.

    State (stopword value_set arrays) built once per actor in __init__ (the
    DataX per-task init lifecycle, dataxPluginDev.md:33-41). Scoring is fully
    vectorized: lower → regex split (one kernel call per batch) → flatten →
    per-language is_in → per-doc bincount → argmax, with ties and no-hits →
    first-lang-in-dict-order / 'und' exactly like the per-row reference.
    """

    # RE2 equivalent of python's [\w']+ tokens under re.U: unicode letters,
    # combining marks (\w matches \p{M} — without it NFD-decomposed text
    # tokenizes differently), unicode digits, underscore, apostrophe
    _SPLIT = r"[^\p{L}\p{M}\p{N}_']+"

    def __init__(self, stopwords: dict[str, set[str]] | None = None):
        self.stop = stopwords or _STOPWORDS
        self.langs = list(self.stop)
        self.value_sets = [pa.array(sorted(self.stop[lang]), pa.string())
                           for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        toks = pc.split_pattern_regex(s, self._SPLIT)
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch)), lens)
        hits = np.zeros((len(self.langs), len(batch)), dtype=np.int64)
        for li, vs in enumerate(self.value_sets):
            m = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            if m.any():
                hits[li] = np.bincount(doc_idx[m.astype(bool)], minlength=len(batch))
        best = hits.argmax(axis=0)  # first max wins = dict-order tie-break
        best_hits = hits[best, np.arange(len(batch))]
        preds = np.where(best_hits > 0, np.array(self.langs)[best], "und")
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


_FP_MOD = np.uint64((1 << 31) - 1)  # Mersenne prime; 31-bit keeps modmul in uint64
_FP_BASE = np.uint64(1_000_003)


def rolling_hash_u31(tokens_hashes: np.ndarray) -> np.uint64:
    """Polynomial rolling hash over a token-hash sequence (mod 2^31-1),
    vectorized: h = Σ t_i · B^(n-1-i). 31-bit values keep every product
    inside uint64."""
    n = len(tokens_hashes)
    if n == 0:
        return np.uint64(0)
    powers = np.empty(n, dtype=np.uint64)
    powers[0] = 1
    for i in range(1, n):  # n = token count; cheap vs the per-token work
        powers[i] = (powers[i - 1] * _FP_BASE) % _FP_MOD
    terms = ((tokens_hashes.astype(np.uint64) % _FP_MOD) * powers[::-1]) % _FP_MOD
    return np.uint64(terms.sum() % _FP_MOD)


def fingerprint64(arr: pa.ChunkedArray) -> pa.Array:
    """Stable 64-bit content fingerprint per document (blake2b-8; C-speed
    digest per row — the digest dominates, and the stage parallelizes across
    tasks). Used for exact-dup detection and incremental diffing."""
    import hashlib

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(arr, "")
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "big") >> 1
         for v in s.to_pylist()),
        dtype=np.int64,
        count=len(s),
    )
    return pa.array(out)


def add_fingerprint(batch: pa.Table, col: str = "text", out: str = "fp64") -> pa.Table:
    return batch.append_column(out, fingerprint64(batch[col]))


# ---------------------------------------------------------------------------
# PII redaction, repetition signals, sequence packing (training-data prep)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (pyarrow and DuckDB both run RE2, so the SQL
# oracle can use the SAME strings with regexp_replace(..., 'g'))
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"


def redact_pii(batch: pa.Table, col: str = "text",
               out: str = "text_redacted") -> pa.Table:
    """Replace emails and URLs with placeholder tokens — the minimal PII
    scrub a web-scale training pipeline runs before tokenization. Pure
    pyarrow.compute regex kernels (RE2), vectorized per batch."""
    s = pc.fill_null(batch[col], "")
    s = pc.replace_substring_regex(s, PII_EMAIL, "<EMAIL>")
    s = pc.replace_substring_regex(s, PII_URL, "<URL>")
    return batch.append_column(out, s)


def add_repetition_signals(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher/MassiveText-style repetition quality signals (Rae et al.
    2021, §A1.1 'repetitious text'): documents dominated by repeated lines
    or n-grams are low-quality boilerplate.

      * dup_line_frac        duplicate lines / lines
      * dup_line_char_frac   chars in duplicate lines / chars in lines
      * top2gram_char_frac   chars covered by the most frequent word 2-gram

    Per-doc Counter work (C-speed dict counting) inside map_batches — the
    standard implementation shape; the stage parallelizes across tasks."""
    from collections import Counter

    texts = pc.fill_null(batch[col], "").to_pylist()
    n = len(texts)
    dl = np.zeros(n, dtype=np.float64)
    dlc = np.zeros(n, dtype=np.float64)
    tg = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        lines = [ln for ln in t.split("\n") if ln.strip()]
        if lines:
            cnt = Counter(lines)
            dup_lines = sum(c - 1 for c in cnt.values())
            dl[i] = dup_lines / len(lines)
            dup_chars = sum(len(ln) * (c - 1) for ln, c in cnt.items())
            tot_chars = sum(len(ln) for ln in lines)
            dlc[i] = dup_chars / tot_chars if tot_chars else 0.0
        toks = t.split()
        if len(toks) >= 2:
            grams = Counter(zip(toks, toks[1:]))
            (a, b), c = max(grams.items(),
                            key=lambda kv: (kv[1], kv[0]))  # deterministic
            covered = (len(a) + len(b)) * c
            total = sum(len(x) for x in toks)
            tg[i] = min(covered / total, 1.0) if total else 0.0
    for name, arr in [("dup_line_frac", dl), ("dup_line_char_frac", dlc),
                      ("top2gram_char_frac", tg)]:
        batch = batch.append_column(name, pa.array(arr))
    return batch


def pack_sequences(ds, max_tokens: int = 512, id_col: str = "doc_id",
                   text_col: str = "text", num_buckets: int = 16):
    """Greedy sequence packing for LLM training: assign documents to bins
    of ≤ max_tokens whitespace tokens (a doc longer than the budget gets
    its own bin). Deterministic AND distribution-invariant: docs hash into
    ``num_buckets`` groups, and within each group packing runs next-fit
    over ascending doc_id — the result is a pure function of (ids, token
    counts), never of block layout, so a single-process reference model
    reproduces it exactly. Bins are (bucket, k) pairs encoded as
    bucket * 2^32 + k.

    Scale shape: one (id, n_tokens) shuffle into num_buckets groups; the
    sequential pass is per-bucket over integers only (text never moves)."""
    def counts(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        h = (ids.to_numpy(zero_copy_only=False).astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return pa.table({
            id_col: ids,
            "n_tokens": pc.cast(token_count(t[text_col]), pa.int64()),
            "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })

    def pack(g: pa.Table) -> pa.Table:
        b = int(g["_bucket"][0].as_py())
        order = np.argsort(g[id_col].combine_chunks().to_numpy(
            zero_copy_only=False))
        ids = g[id_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        toks = g["n_tokens"].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        bins = np.zeros(len(ids), dtype=np.int64)
        k, used = 0, 0
        for i, t in enumerate(toks):
            if used > 0 and used + t > max_tokens:
                k += 1
                used = 0
            bins[i] = (b << 32) | k
            used += int(t)
            if used >= max_tokens:
                k += 1
                used = 0
        return pa.table({id_col: pa.array(ids), "n_tokens": pa.array(toks),
                         "bin_id": pa.array(bins)})

    sized = ds.map_batches(counts, batch_format="pyarrow")
    return sized.groupby("_bucket").map_groups(pack, batch_format="pyarrow")


def html_to_text(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Library-free HTML → text extraction, fully vectorized (RE2 kernels,
    no per-row Python): drop <script>/<style> subtrees wholesale, replace
    every remaining tag (incl. comments) with a space, decode the basic
    entities, collapse whitespace, trim. The first stage of every web-text
    corpus pipeline (a trafilatura/bs4 extractor drops into the same
    column signature for full-fidelity needs)."""
    s = pc.fill_null(arr, "")
    s = pc.replace_substring_regex(s, r"(?is)<script[^>]*>.*?</script>", " ")
    s = pc.replace_substring_regex(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", " ")
    s = pc.replace_substring_regex(s, r"(?s)<[^>]+>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def wrap_html(arr: pa.ChunkedArray | pa.Array, title: str = "t") -> pa.Array:
    """Deterministic inverse fixture for html_to_text: escape the text and
    embed it in a page with head/script/style boilerplate. By construction
    html_to_text(wrap_html(text)) == whitespace-normalized(text)."""
    s = pc.fill_null(arr, "")
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        s = pc.replace_substring(s, ch, ent)
    return pc.binary_join_element_wise(
        "<html><head><title>" + title + "</title>"
        "<script type=\"text/javascript\">var x = 1 < 2;</script>"
        "<style>.c{color:red}</style></head>"
        "<body><!-- header --><h1>", s, "</h1><p>footer</p></body></html>",
        "")
