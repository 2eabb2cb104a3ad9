"""Generator determinism + fixture shape (FIXTURES.md §§1-2)."""

import pyarrow as pa

from dataxray.gen import GenConfig, generate_event_shard, generate_pages, sequential_oracle

CFG = GenConfig(n_urls=200, n_events=2_000, n_shards=4, html_mean=64)


def test_pages_shape_and_determinism():
    a, b = generate_pages(CFG), generate_pages(CFG)
    assert a.equals(b)
    assert a.num_rows == CFG.n_urls
    assert a.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert len(set(a["url"].to_pylist())) == CFG.n_urls
    assert a.schema.field("html").type == pa.large_binary()


def test_event_shards_deterministic_and_txn_contiguous():
    t0 = generate_event_shard(CFG, 0)
    assert t0.equals(generate_event_shard(CFG, 0))
    txns = t0["txn_id"].to_pylist()
    assert txns == sorted(txns) and txns[0] == 1
    ops = set(t0["op"].to_pylist())
    assert ops <= {"I", "U", "D"} and len(ops) == 3


def test_evolution_column_appears_at_boundary():
    shards = [generate_event_shard(CFG, s) for s in range(CFG.n_shards)]
    has = ["content_hash" in t.column_names for t in shards]
    assert has == [False, False, True, True]  # evo_frac=0.5 of 4 shards
    post = shards[2]
    non_del = post.filter(pa.compute.not_equal(post["op"], "D"))
    assert non_del["content_hash"].null_count == 0


def test_delete_rows_have_null_payload():
    t = generate_event_shard(CFG, 1)
    dels = t.filter(pa.compute.equal(t["op"], "D"))
    assert dels["text"].null_count == len(dels)
    assert dels["html"].null_count == len(dels)


def test_sequential_oracle_applies_lww():
    pages = generate_pages(CFG)
    events = pa.table(
        {
            "url": pages["url"].to_pylist()[:2] + [pages["url"][0].as_py()],
            "txn_id": [1, 1, 2],
            "seq": [0, 1, 0],
            "op": ["U", "D", "U"],
            "warc_ts": pa.array([None] * 3, pa.timestamp("ms")),
            "html": pa.array([None] * 3, pa.large_binary()),
            "text": pa.array(["v1", None, "v2"], pa.large_string()),
            "lang": pa.array(["en", None, "en"]),
        }
    )
    out = sequential_oracle(pages, events)
    assert len(out) == CFG.n_urls - 1  # url[1] deleted
    winner = out[out["url"] == pages["url"][0].as_py()]
    assert winner["text"].iloc[0] == "v2" and winner["txn_id"].iloc[0] == 2


def test_dirty_generator_injects_bad_rows():
    cfg = GenConfig(n_urls=100, n_events=1_000, n_shards=2, dirty_frac=0.1)
    t = generate_event_shard(cfg, 0)
    import pyarrow.compute as pc

    bad = (
        t["url"].null_count
        + pc.sum(pc.cast(pc.equal(t["op"], "X"), pa.int64())).as_py()
        + pc.sum(pc.cast(pc.less(t["txn_id"], 0), pa.int64())).as_py()
    )
    assert bad > 10
