"""Deterministic synthetic web-page table + CDC change-log generator.

Analog of the reference's synthetic source plugin ``streamreader``
(StreamReader.java:99-171: typed random/constant column specs, N identical
splits of ``sliceRecordCount`` rows) — but deterministic: every shard is
seeded by ``f(seed, shard_index)`` so the same config always produces the
same bytes, at any scale, with no wall clock or global RNG
(FIXTURES.md; SURVEY.md §7.1 gen.py).

Produces:
  * ``pages.parquet``      — base table, unique urls, txn_id=0 state
  * ``events/events-{i:05d}.parquet`` — change-log shards, each covering a
    contiguous txn range (filename-addressable for watermark pruning, like
    otsstreamreader's shard/time-window export, OTSStreamReaderMasterProxy.java:78-107)
  * optional dirty variant — a fraction of malformed rows (null url, bad op,
    txn regression) to exercise the dirty-record budget
    (ErrorRecordChecker.java:18-84)

The additive-schema-evolution column ``content_hash`` appears only in shards
whose txn range starts at/after ``evo_txn`` (FIXTURES.md §2).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import EVENT_SCHEMA, EVENT_SCHEMA_EVOLVED, PAGE_SCHEMA

_EPOCH_MS = 1_577_836_800_000  # 2020-01-01, fixed base (no wall clock)
_LANGS = np.array(["en", "de", "zh", "fr", "es", "pt", "ru", "ja"])


@dataclass(frozen=True)
class GenConfig:
    n_urls: int = 2_000
    n_events: int = 20_000
    n_shards: int = 8
    txn_size: int = 4  # rows per transaction; seq = row index within txn
    zipf_s: float = 1.1  # url popularity skew
    evo_frac: float = 0.5  # fraction of shards after which content_hash appears
    html_mean: int = 256  # mean html payload bytes (lognormal-ish)
    seed: int = 42
    p_ops: tuple[float, float, float] = (0.2, 0.7, 0.1)  # I, U, D
    dirty_frac: float = 0.0
    compression: str = "zstd"  # what a real 100TB event lake ships as
    row_group_size: int = 32_768  # split granularity for parallel reads

    @property
    def txns_total(self) -> int:
        return (self.n_events + self.txn_size - 1) // self.txn_size

    @property
    def evo_txn(self) -> int:
        """First txn_id whose file carries content_hash (shard-aligned)."""
        evo_shard = int(self.n_shards * self.evo_frac)
        return evo_shard * _events_per_shard(self) // self.txn_size + 1


def _urls_for(url_ids: np.ndarray) -> pa.Array:
    """Vectorized url strings: https://host{id%97}.example/p/{id}."""
    host = pc.cast(pa.array(url_ids % 97), pa.string())
    pid = pc.cast(pa.array(url_ids), pa.string())
    return pc.binary_join_element_wise("https://host", host, ".example/p/", pid, "")


def _text_for(url_ids: np.ndarray, txns: np.ndarray) -> pa.Array:
    """Deterministic 'extracted text' = f(url, txn) — the byte-identity invariant
    column (BASELINE.json input_hint). Winning event is identifiable byte-wise."""
    u = pc.cast(pa.array(url_ids), pa.string())
    t = pc.cast(pa.array(txns), pa.string())
    filler = pc.cast(pa.array((url_ids * 31 + txns * 7) % 1000), pa.string())
    return pc.cast(
        pc.binary_join_element_wise("text|url=", u, "|txn=", t, "|payload=", filler, "|end", ""),
        pa.large_string(),
    )


def _content_hash_for(url_ids: np.ndarray, txns: np.ndarray) -> pa.Array:
    h = (url_ids * np.uint64(2654435761) + txns.astype(np.uint64) * np.uint64(40503)) % np.uint64(1 << 32)
    return pc.binary_join_element_wise("ch-", pc.cast(pa.array(h), pa.string()), "")


def _html_for(rng: np.random.Generator, n: int, mean: int) -> pa.Array:
    """Seeded pseudo-HTML bytes, variable length, built zero-copy from one
    random buffer + offsets (no per-row python)."""
    lens = np.minimum(
        (rng.lognormal(mean=np.log(max(mean, 8)), sigma=0.6, size=n)).astype(np.int64),
        64 * 1024,
    )
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = rng.integers(32, 127, size=int(offsets[-1]), dtype=np.uint8)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(buf.tobytes())]
    )


def generate_pages(cfg: GenConfig) -> pa.Table:
    """Base web-page table: every url, state as of txn 0."""
    rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 0xBA5E]))
    ids = np.arange(cfg.n_urls, dtype=np.int64)
    txn0 = np.zeros(cfg.n_urls, dtype=np.int64)
    tbl = pa.table(
        {
            "url": _urls_for(ids),
            "warc_ts": pa.array(_EPOCH_MS + (ids * 1_000) % 86_400_000, pa.timestamp("ms")),
            "html": _html_for(rng, cfg.n_urls, cfg.html_mean),
            "text": _text_for(ids, txn0),
            "lang": pa.array(_LANGS[ids % len(_LANGS)]),
        }
    )
    return tbl.cast(PAGE_SCHEMA)


def _events_per_shard(cfg: GenConfig) -> int:
    """Shard size aligned to whole transactions: a WAL segment must never
    split a txn across files (real log segmenters rotate at commit
    boundaries; the engine's txn watermarks assume it — sources/wal.py
    rejects violating file sets)."""
    per = (cfg.n_events + cfg.n_shards - 1) // cfg.n_shards
    return ((per + cfg.txn_size - 1) // cfg.txn_size) * cfg.txn_size


def generate_event_shard(cfg: GenConfig, shard: int) -> pa.Table:
    """One change-log shard, txn-contiguous, seeded by (seed, shard)."""
    per = _events_per_shard(cfg)
    lo = shard * per
    hi = max(lo, min(lo + per, cfg.n_events))  # trailing shards may be empty
    n = hi - lo
    rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, shard]))

    row = np.arange(lo, hi, dtype=np.int64)
    txn = row // cfg.txn_size + 1  # txn 0 is the base table
    seq = row % cfg.txn_size
    # Zipf-skewed url choice (hot keys) — deterministic per shard.
    url_ids = (rng.zipf(cfg.zipf_s, size=n) - 1) % cfg.n_urls
    ops_draw = rng.random(n)
    p_i, p_u, _ = cfg.p_ops
    op = np.where(ops_draw < p_i, "I", np.where(ops_draw < p_i + p_u, "U", "D"))
    is_del = op == "D"

    warc = pa.array(
        np.where(is_del, np.int64(0), _EPOCH_MS + (url_ids * 1_000 + txn) % 86_400_000),
        pa.timestamp("ms"),
        mask=is_del,
    )
    html = _html_for(rng, n, cfg.html_mean)
    del_mask = pa.array(is_del)
    html = pc.if_else(del_mask, pa.scalar(None, pa.large_binary()), html)
    text = pc.if_else(del_mask, pa.scalar(None, pa.large_string()), _text_for(url_ids, txn))
    lang = pc.if_else(del_mask, pa.scalar(None, pa.string()), pa.array(_LANGS[url_ids % len(_LANGS)]))

    cols = {
        "url": _urls_for(url_ids),
        "txn_id": pa.array(txn),
        "seq": pa.array(seq),
        "op": pa.array(op),
        "warc_ts": warc,
        "html": html,
        "text": text,
        "lang": lang,
    }
    schema = EVENT_SCHEMA
    if n and txn[0] >= cfg.evo_txn:
        ch = pc.if_else(del_mask, pa.scalar(None, pa.string()), _content_hash_for(url_ids, txn))
        cols["content_hash"] = ch
        schema = EVENT_SCHEMA_EVOLVED
    tbl = pa.table(cols).cast(schema)

    if cfg.dirty_frac > 0:
        tbl = _corrupt(tbl, rng, cfg.dirty_frac)
    return tbl


def _corrupt(tbl: pa.Table, rng: np.random.Generator, frac: float) -> pa.Table:
    """Inject malformed rows: null url / op outside {I,U,D} / txn_id < 0."""
    n = len(tbl)
    bad = rng.random(n) < frac
    kind = rng.integers(0, 3, size=n)
    url = pc.if_else(pa.array(bad & (kind == 0)), pa.scalar(None, pa.string()), tbl["url"].combine_chunks())
    op = pc.if_else(pa.array(bad & (kind == 1)), pa.scalar("X"), tbl["op"].combine_chunks())
    txn = pc.if_else(pa.array(bad & (kind == 2)), pa.scalar(-1, pa.int64()), tbl["txn_id"].combine_chunks())
    return (
        tbl.set_column(tbl.schema.get_field_index("url"), "url", url)
        .set_column(tbl.schema.get_field_index("op"), "op", op)
        .set_column(tbl.schema.get_field_index("txn_id"), "txn_id", txn)
    )


def shard_txn_range(cfg: GenConfig, shard: int) -> tuple[int, int]:
    """[txn_lo, txn_hi] covered by a shard file (inclusive)."""
    per = _events_per_shard(cfg)
    lo = shard * per
    hi = min(lo + per, cfg.n_events) - 1
    return lo // cfg.txn_size + 1, hi // cfg.txn_size + 1


def write_dataset(out_dir: str, cfg: GenConfig, parallel: bool = True) -> dict:
    """Write pages.parquet + events/ shards + gen_meta.json. Idempotent: if
    gen_meta.json matches cfg, the existing data is reused (bench cache)."""
    meta_path = os.path.join(out_dir, "gen_meta.json")
    cfg_dict = asdict(cfg)
    cfg_dict["p_ops"] = list(cfg.p_ops)
    cfg_dict["_gen_version"] = 2  # v2: txn-aligned shard boundaries
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("config") == cfg_dict:
                with open(meta_path) as f2:
                    return json.load(f2)
    os.makedirs(os.path.join(out_dir, "events"), exist_ok=True)
    pq.write_table(generate_pages(cfg), os.path.join(out_dir, "pages.parquet"),
                   compression=cfg.compression, row_group_size=cfg.row_group_size)

    def _write_shard(shard: int) -> tuple[str, int, int] | None:
        t = generate_event_shard(cfg, shard)
        if len(t) == 0:  # txn alignment can leave trailing shards empty
            return None
        path = os.path.join(out_dir, "events", f"events-{shard:05d}.parquet")
        pq.write_table(t, path, compression=cfg.compression, row_group_size=cfg.row_group_size)
        lo, hi = shard_txn_range(cfg, shard)
        return path, lo, hi

    shards = []
    if parallel:
        import ray

        if ray.is_initialized():
            fn = ray.remote(num_cpus=1)(_write_shard)
            shards = ray.get([fn.remote(s) for s in range(cfg.n_shards)])
        else:
            parallel = False
    if not parallel:
        shards = [_write_shard(s) for s in range(cfg.n_shards)]

    shards = [sh for sh in shards if sh is not None]
    meta = {
        "config": cfg_dict,
        "pages": os.path.join(out_dir, "pages.parquet"),
        "event_shards": [{"path": p, "txn_lo": lo, "txn_hi": hi} for p, lo, hi in shards],
        "evo_txn": cfg.evo_txn,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def sequential_oracle(pages: pa.Table, events: pa.Table) -> "object":
    """Single-process reference: apply events in (txn_id, seq) order per url.

    I/U upsert the full payload row; D deletes. Returns a pandas DataFrame of
    the surviving rows (evolved schema; content_hash None where the winning
    write predates evolution). Used by pytest to check the engine byte-for-byte
    (FIXTURES.md §3)."""
    import pandas as pd

    payload_cols = [f.name for f in EVENT_SCHEMA_EVOLVED if f.name not in ("op",)]
    state: dict[str, dict] = {}
    for _, r in pages.to_pandas().iterrows():
        row = {c: r.get(c) for c in payload_cols if c in pages.column_names or c == "url"}
        row.update({"txn_id": 0, "seq": 0, "content_hash": None})
        state[r["url"]] = row
    ev = events.to_pandas().sort_values(["txn_id", "seq"], kind="stable")
    has_ch = "content_hash" in ev.columns
    for r in ev.itertuples(index=False):
        if r.op == "D":
            state.pop(r.url, None)
        else:
            state[r.url] = {
                "url": r.url,
                "txn_id": r.txn_id,
                "seq": r.seq,
                "warc_ts": r.warc_ts,
                "html": r.html,
                "text": r.text,
                "lang": r.lang,
                "content_hash": getattr(r, "content_hash", None) if has_ch else None,
            }
    cols = ["url", "txn_id", "seq", "warc_ts", "html", "text", "lang", "content_hash"]
    if not state:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(list(state.values()))[cols].sort_values("url").reset_index(drop=True)
