"""Multi-pass persistence policy (stages/persist.py): above the byte
budget (or always, when the budget is <= 0) a multi-pass corpus is staged
to parquet instead of pinned in the object store — the 100-TB path must
not lean on plasma spill. The staged path must be result-identical."""

import os

import pyarrow as pa
import pytest

from dataxray.stages import persist as P


@pytest.fixture()
def docs_ds():
    import ray.data

    texts = [f"alpha beta gamma delta epsilon doc {i} " + ("x y z " * (i % 5))
             for i in range(60)]
    # make real duplicate content so the dedup operators emit pairs
    texts[7] = texts[3]
    texts[19] = texts[3] + " x"
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _pairs(ds, **kw):
    from dataxray.functions.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(ds, threshold=0.7, **kw).take_all()
    return sorted((r["id_a"], r["id_b"]) for r in out)


def test_forced_staging_is_result_identical(docs_ds, monkeypatch, tmp_path):
    before = len(P.STAGED_DIRS)
    plain = _pairs(docs_ds)

    monkeypatch.setenv("DATAXRAY_STAGE_BUDGET_BYTES", "0")
    staged = _pairs(docs_ds)
    assert staged == plain and len(plain) >= 1
    assert len(P.STAGED_DIRS) > before  # the staged path really ran
    # staged dirs hold real parquet files
    d = P.STAGED_DIRS[-1]
    assert any(f.endswith(".parquet") for f in os.listdir(d))


def test_containment_staged_matches(docs_ds, monkeypatch):
    from dataxray.functions.dedup import containment_pairs

    def run():
        out = containment_pairs(docs_ds, threshold=0.8).take_all()
        return sorted((r["id_a"], r["id_b"]) for r in out)

    plain = run()
    monkeypatch.setenv("DATAXRAY_STAGE_BUDGET_BYTES", "0")
    staged = run()
    assert staged == plain and len(plain) >= 1


def test_budget_demotion(docs_ds, monkeypatch):
    """budget > 0: a corpus larger than the budget is demoted from plasma
    to the stage; a huge budget keeps it materialized."""
    before = len(P.STAGED_DIRS)
    out = P.persist_multi_pass(docs_ds, budget_bytes=1, label="t")
    assert len(P.STAGED_DIRS) == before + 1
    assert out.count() == 60

    out2 = P.persist_multi_pass(docs_ds, budget_bytes=1 << 40, label="t")
    assert len(P.STAGED_DIRS) == before + 1  # no new stage dir
    assert out2.count() == 60


def test_minhash_index_staged_matches(tmp_path, docs_ds, monkeypatch):
    """The incremental MinHash index's band-row persist also honors the
    staging budget; pairs are unchanged."""
    from dataxray.state.dedup_index import MinHashIndex

    def run(root):
        idx = MinHashIndex(str(root)).create()
        pairs = idx.ingest(docs_ds, docs_ds, threshold=0.5,
                           label="e1").take_all()
        return sorted((r["id_a"], r["id_b"]) for r in pairs)

    plain = run(tmp_path / "idx-plain")
    monkeypatch.setenv("DATAXRAY_STAGE_BUDGET_BYTES", "0")
    staged = run(tmp_path / "idx-staged")
    assert staged == plain and len(plain) >= 1
