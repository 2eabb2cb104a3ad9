"""Persistent MinHash/LSH sidecar index (state.dedup_index)."""

import pyarrow as pa
import pytest

from dataxray.state.dedup_index import MinHashIndex


def _docs():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",  # near-dup of 0
        "completely different content about ray data pipelines at scale",
        "completely different content about ray data pipelines at scale",  # exact dup of 2
        "a third unrelated document mentioning parquet and arrow buffers",
        "the quick brown fox jumps over the lazy dog again and once more",  # near 0/1
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _pairs_set(ds):
    t = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return set(zip(t["id_a"], t["id_b"]))


@pytest.mark.parametrize("scheme", ["", "mocks3://"])
def test_incremental_equals_one_shot(tmp_path, scheme):
    import ray.data

    from dataxray.functions.dedup import minhash_dedup_pairs

    docs = _docs()
    full = _pairs_set(minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.5))
    assert full  # sanity: the fixture contains dups

    root = f"{scheme}{tmp_path / 'idx'}"
    idx = MinHashIndex(root).create()
    corpus = ray.data.from_arrow(docs)
    e1 = docs.filter(pa.compute.less(docs["doc_id"], 3))
    e2 = docs.filter(pa.compute.greater_equal(docs["doc_id"], 3))
    p1 = _pairs_set(idx.ingest(ray.data.from_arrow(e1), corpus,
                               threshold=0.5, label="e1"))
    p2 = _pairs_set(idx.ingest(ray.data.from_arrow(e2), corpus,
                               threshold=0.5, label="e2"))
    assert p1 | p2 == full
    assert not (p1 & p2)  # epochs never re-deliver a pair


def test_replayed_label_is_noop(tmp_path):
    import ray.data

    docs = _docs()
    idx = MinHashIndex(str(tmp_path / "idx")).create()
    corpus = ray.data.from_arrow(docs)
    first = _pairs_set(idx.ingest(corpus, corpus, threshold=0.5, label="e1"))
    assert first
    rows_before = idx.indexed_rows()
    again = idx.ingest(corpus, corpus, threshold=0.5, label="e1")
    assert again.count() == 0
    assert idx.indexed_rows() == rows_before


def test_probe_reads_only_touched_buckets(tmp_path):
    """File-level pruning: _live_files restricted to a bucket set returns a
    strict subset once the index spans several buckets."""
    import ray.data

    docs = _docs()
    idx = MinHashIndex(str(tmp_path / "idx")).create(num_buckets=8)
    idx.ingest(ray.data.from_arrow(docs), ray.data.from_arrow(docs),
               threshold=0.5, label="e1")
    all_files = idx._live_files()
    buckets = {f["bucket"] for e in idx.meta()["epochs"].values()
               for f in e["files"]}
    assert len(buckets) > 1
    one = next(iter(buckets))
    pruned = idx._live_files({one})
    assert 0 < len(pruned) < len(all_files)


def test_empty_epoch_commits_label(tmp_path):
    import ray.data

    docs = _docs()
    idx = MinHashIndex(str(tmp_path / "idx")).create()
    empty = ray.data.from_arrow(docs.slice(0, 0))
    out = idx.ingest(empty, ray.data.from_arrow(docs), label="e1")
    assert out.count() == 0
    assert "e1" in idx.meta()["epochs"]


def test_ingest_with_empty_blocks(tmp_path):
    """Regression (round-3 gate crash at num_cpus=32): blocks ≫ rows means
    most batches reaching explode_bands are EMPTY; an untyped pa.array([])
    inferred doc_id: null and the strict concat in pairs_from_buckets.expand
    refused the mixed schemas. repartition(32) forces the same shape at any
    test parallelism."""
    import ray.data

    from dataxray.functions.dedup import minhash_dedup_pairs

    docs = _docs()
    full = _pairs_set(minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.5))

    idx = MinHashIndex(str(tmp_path / "idx")).create()
    corpus = ray.data.from_arrow(docs)
    e1 = docs.filter(pa.compute.less(docs["doc_id"], 3))
    e2 = docs.filter(pa.compute.greater_equal(docs["doc_id"], 3))
    p1 = _pairs_set(idx.ingest(ray.data.from_arrow(e1).repartition(32), corpus,
                               threshold=0.5, label="e1"))
    p2 = _pairs_set(idx.ingest(ray.data.from_arrow(e2).repartition(32), corpus,
                               threshold=0.5, label="e2"))
    assert p1 | p2 == full


def test_one_shot_pipelines_with_empty_blocks():
    """The one-shot minhash / simhash / embedding-LSH paths share the same
    explode stages — they must also survive an all-but-empty block layout."""
    import numpy as np
    import ray.data

    from dataxray.functions.dedup import (embedding_dup_pairs_lsh,
                                          minhash_dedup_pairs, simhash_pairs)

    docs = _docs()
    sparse = ray.data.from_arrow(docs).repartition(32)
    assert _pairs_set(minhash_dedup_pairs(sparse, threshold=0.5)) == _pairs_set(
        minhash_dedup_pairs(ray.data.from_arrow(docs), threshold=0.5))
    assert _pairs_set(simhash_pairs(sparse, max_hamming=6)) == _pairs_set(
        simhash_pairs(ray.data.from_arrow(docs), max_hamming=6))

    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 4))
    vecs = pa.table({
        "vec_id": pa.array(range(16), pa.int64()),
        "embedding": pa.array([list(map(float, base[i % 8] + (0.001 if i >= 8 else 0)))
                               for i in range(16)], pa.list_(pa.float64())),
    })
    dense = ray.data.from_arrow(vecs)
    assert _pairs_set(embedding_dup_pairs_lsh(dense.repartition(48),
                                              threshold=0.9)) == \
        _pairs_set(embedding_dup_pairs_lsh(dense, threshold=0.9))


def test_ngram_capped_bucket_raises():
    """ngram_jaccard_pairs advertises exactness — a bucket over max_bucket
    must fail loudly on the DRIVER, not silently drop candidates on a
    worker (ADVICE r03)."""
    import ray.data

    from dataxray.functions.dedup import ngram_jaccard_pairs

    texts = ["common shared prefix words here plus doc %d" % i
             for i in range(12)]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    with pytest.raises(RuntimeError, match="max_bucket"):
        ngram_jaccard_pairs(ray.data.from_arrow(docs), threshold=0.2,
                            max_bucket=2)
    # and a roomy cap still works end-to-end
    out = ngram_jaccard_pairs(ray.data.from_arrow(docs), threshold=0.2,
                              max_bucket=1024)
    assert out.count() > 0


def test_source_version_sync_detects_and_heals(tmp_path, monkeypatch):
    """Sidecar-atomicity contract: the index records the source version each
    epoch was built against. A crash between a source commit and the
    matching ingest leaves a DETECTABLE (require_synced raises) and
    SELF-HEALING (ingest the missed docs) state; a crash INSIDE ingest
    (before its _meta commit point) leaves the index untouched and the
    retried label completes."""
    import ray.data

    from dataxray.functions.dedup import minhash_dedup_pairs
    from dataxray.state import lakefs

    docs = _docs()
    idx = MinHashIndex(str(tmp_path / "idx")).create()
    e1 = docs.filter(pa.compute.less(docs["doc_id"], 3))
    e2 = docs.filter(pa.compute.greater_equal(docs["doc_id"], 3))

    p1 = _pairs_set(idx.ingest(ray.data.from_arrow(e1),
                               ray.data.from_arrow(docs), threshold=0.5,
                               label="e1", source_version="v1"))
    assert idx.sync_status("v1")["in_sync"]

    # source advances to v2; the ingest that should follow CRASHES before
    # the index's commit point (its final _meta.json PUT)
    real_put = lakefs.LocalLakeFS.put_json

    def crashing_put(self, path, obj):
        import os as _os

        if _os.path.basename(path) == "_meta.json" and "epochs" in obj \
                and "e2" in obj["epochs"]:
            raise RuntimeError("simulated crash inside ingest")
        return real_put(self, path, obj)

    monkeypatch.setattr(lakefs.LocalLakeFS, "put_json", crashing_put)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.ingest(ray.data.from_arrow(e2), ray.data.from_arrow(docs),
                   threshold=0.5, label="e2", source_version="v2")
    monkeypatch.setattr(lakefs.LocalLakeFS, "put_json", real_put)

    # detectable: the index self-reports it is behind v2
    assert not idx.sync_status("v2")["in_sync"]
    with pytest.raises(RuntimeError, match="v2"):
        idx.require_synced("v2")
    assert "e2" not in idx.meta()["epochs"]  # torn ingest left no epoch

    # self-healing: re-ingest the missed epoch, then everything lines up
    p2 = _pairs_set(idx.ingest(ray.data.from_arrow(e2),
                               ray.data.from_arrow(docs), threshold=0.5,
                               label="e2", source_version="v2"))
    idx.require_synced("v2")
    full = _pairs_set(minhash_dedup_pairs(
        ray.data.from_arrow(docs), threshold=0.5))
    assert p1 | p2 == full


def test_lake_version_token_moves_with_commits(tmp_path):
    from dataxray.gen import GenConfig, write_dataset
    from dataxray.pipelines.replay import ReplayConfig, replay
    from dataxray.state.manifest import Lake

    cfg = GenConfig(n_urls=80, n_events=400, n_shards=2, html_mean=32)
    d = str(tmp_path / "data")
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake")
    import os as _os

    replay(_os.path.join(d, "events"), lake,
           pages_path=_os.path.join(d, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=4))
    t1 = Lake(lake).version_token()
    assert t1.startswith("g0:txn")
    Lake(lake).evolve_partitions(8)
    t2 = Lake(lake).version_token()
    assert t2 != t1 and t2.startswith("g1:")
