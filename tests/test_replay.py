"""End-to-end CDC replay vs the sequential oracle (FIXTURES.md §3):

1. engine final table == oracle per url, byte-identical `text`;
2. schema equality incl. the promoted content_hash column;
3. re-running committed work changes nothing (exactly-once);
4. epoch-by-epoch resume reaches the same final state;
5. salted hot-url path == unsalted output;
6. dirty events respect the error budget.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataxray.errors import ErrorBudgetExceeded, ErrorLimit
from dataxray.gen import GenConfig, generate_event_shard, generate_pages, sequential_oracle, write_dataset
from dataxray.pipelines.replay import ReplayConfig, replay
from dataxray.state.manifest import Lake

CFG = GenConfig(n_urls=300, n_events=3_000, n_shards=6, html_mean=48, zipf_s=1.2)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdcdata"))
    write_dataset(d, CFG, parallel=False)
    return d


@pytest.fixture(scope="module")
def oracle_df():
    pages = generate_pages(CFG)
    shards = [generate_event_shard(CFG, s) for s in range(CFG.n_shards)]
    events = pa.concat_tables(shards, promote_options="permissive")
    return sequential_oracle(pages, events)


def lake_df(lake_dir):
    t = Lake(lake_dir).read_all()
    return t.to_pandas().sort_values("url").reset_index(drop=True)


def assert_matches_oracle(lake_dir, oracle_df):
    got = lake_df(lake_dir)
    assert list(got.columns) == list(oracle_df.columns)
    assert len(got) == len(oracle_df)
    assert got["url"].tolist() == oracle_df["url"].tolist()
    # the per-url byte-identity invariant on extracted text (BASELINE.json)
    assert got["text"].tolist() == oracle_df["text"].tolist()
    assert got["txn_id"].tolist() == oracle_df["txn_id"].tolist()
    assert got["html"].tolist() == oracle_df["html"].tolist()
    ch = got["content_hash"].where(got["content_hash"].notna(), None).tolist()
    assert ch == oracle_df["content_hash"].tolist()


def test_full_replay_matches_oracle(data_dir, oracle_df, tmp_path):
    lake = str(tmp_path / "lake")
    rep = replay(os.path.join(data_dir, "events"), lake,
                 pages_path=os.path.join(data_dir, "pages.parquet"),
                 cfg=ReplayConfig(num_partitions=8))
    assert rep.partitions_committed > 0
    assert_matches_oracle(lake, oracle_df)
    # schema evolved: content_hash promoted into lake event schema
    assert "content_hash" in Lake(lake).event_schema().names


def test_replay_is_exactly_once_on_duplicate_delivery(data_dir, oracle_df, tmp_path):
    lake = str(tmp_path / "lake")
    replay(os.path.join(data_dir, "events"), lake,
           pages_path=os.path.join(data_dir, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8))
    before = lake_df(lake)
    rep2 = replay(os.path.join(data_dir, "events"), lake, cfg=ReplayConfig(num_partitions=8))
    assert rep2.partitions_committed == 0
    after = lake_df(lake)
    assert before.equals(after)
    assert_matches_oracle(lake, oracle_df)


def test_epoch_resume_reaches_same_state(data_dir, oracle_df, tmp_path):
    """Replay shard-by-shard (crash/resume between epochs) == one-shot replay."""
    lake = str(tmp_path / "lake")
    epochs = str(tmp_path / "epochs")
    os.makedirs(epochs)
    files = sorted(os.listdir(os.path.join(data_dir, "events")))
    # bootstrap with pages only
    replay(None, lake, pages_path=os.path.join(data_dir, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8))
    for i, f in enumerate(files):
        shutil.copy(os.path.join(data_dir, "events", f), os.path.join(epochs, f))
        replay(epochs, lake, cfg=ReplayConfig(num_partitions=8))
    assert_matches_oracle(lake, oracle_df)


def test_salted_path_identical_output(data_dir, oracle_df, tmp_path):
    lake = str(tmp_path / "lake_salted")
    replay(os.path.join(data_dir, "events"), lake,
           pages_path=os.path.join(data_dir, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8, num_salts=4))
    assert_matches_oracle(lake, oracle_df)


def test_commit_label_dedup(tmp_path):
    lake = Lake(str(tmp_path / "l"))
    lake.init(2, pa.schema([("url", pa.string()), ("txn_id", pa.int64()),
                            ("seq", pa.int64()), ("op", pa.string())]))
    t = pa.table({"url": ["a"], "txn_id": [3], "seq": [0]})
    m1 = lake.write_staged("r1", 0, t)
    assert lake.commit(0, 3, m1["staged"], 1, t.nbytes, "r1") == "committed"
    m2 = lake.write_staged("r2", 0, t)
    assert lake.commit(0, 3, m2["staged"], 1, t.nbytes, "r2") == "skipped"
    assert lake.commit(0, 2, [], 1, 0, "r3") == "skipped"  # monotonic txn ids
    assert lake.watermarks() == {0: 3}


def test_error_budget_enforced(tmp_path):
    cfg = GenConfig(n_urls=100, n_events=2_000, n_shards=2, dirty_frac=0.05, html_mean=32)
    d = str(tmp_path / "dirty_data")
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake")
    dirty = str(tmp_path / "dirty_out")
    with pytest.raises(ErrorBudgetExceeded):
        replay(os.path.join(d, "events"), lake,
               pages_path=os.path.join(d, "pages.parquet"),
               cfg=ReplayConfig(num_partitions=4, dirty_dir=dirty,
                                error_limit=ErrorLimit(record=10)))
    # budget failure aborts before commit: no manifests written
    assert Lake(lake).watermarks() == {}
    # generous budget: run succeeds and dirty rows are all captured
    lake2 = str(tmp_path / "lake2")
    dirty2 = str(tmp_path / "dirty_out2")
    rep = replay(os.path.join(d, "events"), lake2,
                 pages_path=os.path.join(d, "pages.parquet"),
                 cfg=ReplayConfig(num_partitions=4, dirty_dir=dirty2,
                                  error_limit=ErrorLimit(percentage=0.25)))
    assert rep.total_error_records > 0
    import glob
    n = sum(pq.read_metadata(p).num_rows for p in glob.glob(os.path.join(dirty2, "**", "*.parquet"), recursive=True))
    assert n == rep.total_error_records


def test_auto_salted_path_identical_output(data_dir, oracle_df, tmp_path):
    """Heavy-hitter auto-salting must not change results (stage B re-reduces
    per url, so per-batch salting decisions are correctness-neutral)."""
    lake = str(tmp_path / "lake_autosalt")
    replay(os.path.join(data_dir, "events"), lake,
           pages_path=os.path.join(data_dir, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8, num_salts=4, auto_salt=True,
                            hot_frac=0.005))
    assert_matches_oracle(lake, oracle_df)


def test_dirty_rows_carry_reasons(tmp_path):
    import glob

    cfg = GenConfig(n_urls=50, n_events=500, n_shards=1, dirty_frac=0.2, html_mean=16)
    d = str(tmp_path / "dd")
    write_dataset(d, cfg, parallel=False)
    lake = str(tmp_path / "lake")
    dirty = str(tmp_path / "dirty")
    replay(os.path.join(d, "events"), lake,
           cfg=ReplayConfig(num_partitions=2, dirty_dir=dirty,
                            error_limit=ErrorLimit(percentage=0.9)))
    files = glob.glob(os.path.join(dirty, "**", "*.parquet"), recursive=True)
    assert files
    t = pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")
    reasons = set(t["_dirty_reason"].to_pylist())
    assert reasons <= {"null_or_empty_url", "bad_op", "txn_regression", "null_payload"}
    assert len(reasons) >= 2


def test_direct_exchange_matches_oracle(data_dir, oracle_df, tmp_path):
    """Both exchange implementations must produce identical lake state
    (direct is the default since round 3; this keeps the sort shuffle path
    regression-covered too)."""
    for exchange in ("direct", "sort"):
        lake = str(tmp_path / f"lake_{exchange}")
        rep = replay(os.path.join(data_dir, "events"), lake,
                     pages_path=os.path.join(data_dir, "pages.parquet"),
                     cfg=ReplayConfig(num_partitions=8, exchange=exchange))
        assert rep.partitions_committed == 8
        assert_matches_oracle(lake, oracle_df)
        # incremental no-op on re-delivery through either path too
        rep2 = replay(os.path.join(data_dir, "events"), lake,
                      cfg=ReplayConfig(num_partitions=8, exchange=exchange))
        assert rep2.partitions_committed == 0


def test_single_partition_direct_exchange(data_dir, oracle_df, tmp_path):
    """P=1 exercises the no-split path of the direct exchange (review fix:
    Ray doesn't unpack num_returns=1 tuples)."""
    lake = str(tmp_path / "lake_p1")
    replay(os.path.join(data_dir, "events"), lake,
           pages_path=os.path.join(data_dir, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=1, exchange="direct"))
    assert_matches_oracle(lake, oracle_df)


def test_two_level_exchange_matches_oracle(data_dir, oracle_df, tmp_path):
    """levels=2 (split -> coarse groups -> fan-out) must produce the exact
    same lake state as the single-level exchange, including on a P whose
    sqrt grouping leaves a narrow last group (P=7 -> widths 3,3,1, which
    exercises the num_returns=1 fan-out shape)."""
    for p in (8, 7):
        lake = str(tmp_path / f"lake_2l_{p}")
        rep = replay(os.path.join(data_dir, "events"), lake,
                     pages_path=os.path.join(data_dir, "pages.parquet"),
                     cfg=ReplayConfig(num_partitions=p, exchange="direct",
                                      exchange_levels=2, exchange_regroup=2))
        assert rep.partitions_committed == p
        assert_matches_oracle(lake, oracle_df)
        rep2 = replay(os.path.join(data_dir, "events"), lake,
                      cfg=ReplayConfig(num_partitions=p, exchange="direct",
                                       exchange_levels=2))
        assert rep2.partitions_committed == 0


def test_two_level_exchange_unit_semantics(tmp_path):
    """Unit-level: both exchange shapes deliver every row to exactly its
    _part's merge, with empty blocks and skewed parts in the mix."""
    import numpy as np
    import ray.data

    from dataxray.schema import PART_COL
    from dataxray.stages.exchange import direct_exchange

    rng = np.random.default_rng(7)
    n, p = 5000, 13
    parts = np.concatenate([rng.integers(0, p, n - 1000),
                            np.full(1000, 3)]).astype(np.int32)  # skew p=3
    vals = np.arange(len(parts), dtype=np.int64)
    t = pa.table({PART_COL: pa.array(parts), "v": pa.array(vals)})
    want = {int(q): int(vals[parts == q].sum()) for q in range(p)}

    def merge_fn(q, tables):
        tot = sum(int(pa.Table.column(x, "v").combine_chunks()
                      .to_numpy().sum()) for x in tables if len(x))
        return {"partition": q, "sum": tot}

    for levels in (1, 2):
        ds = ray.data.from_arrow(t).repartition(37)  # force empty/small blocks
        got = {m["partition"]: m["sum"]
               for m in direct_exchange(ds, p, lambda q, ts: merge_fn(q, ts),
                                        {}, levels=levels, regroup=3)}
        assert got == {q: s for q, s in want.items()}, levels
