"""Cogroup full outer join (dataxray/functions/joins.py)."""

import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.joins import full_outer_groupjoin


def _ds(t, blocks=4):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


def test_full_outer_groupjoin_all_row_classes():
    l = pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                  "a": pa.array([10, 20, 21, 30], pa.int64())})
    r = pa.table({"j": pa.array([2, 2, 4], pa.int64()),
                  "b": pa.array([200, 201, 400], pa.int64())})
    out = (full_outer_groupjoin(_ds(l), _ds(r), "k", "j",
                                {"a": pa.int64()}, {"b": pa.int64()})
           .to_pandas().sort_values(["key", "a", "b"], na_position="first")
           .reset_index(drop=True))
    # key 1,3: left-only; key 2: 2x2 cross; key 4: right-only
    assert len(out) == 2 + 4 + 1
    k2 = out[out.key == 2]
    assert sorted(zip(k2.a, k2.b)) == [(20, 200), (20, 201),
                                       (21, 200), (21, 201)]
    assert out[out.key == 4].a.isna().all()
    assert out[out.key.isin([1, 3])].b.isna().all()


def test_full_outer_groupjoin_collision_raises():
    l = pa.table({"k": pa.array([1], pa.int64()), "x": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        full_outer_groupjoin(_ds(l, 1), _ds(l, 1), "k", "k",
                             {"x": pa.int64()}, {"x": pa.int64()})


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_outer_groupjoin_matches_duckdb(seed):
    """Randomized parity with DuckDB FULL OUTER JOIN, including duplicate
    keys on both sides (cross products) and empty-partition-inducing
    sparsity."""
    import duckdb

    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 40))
    l = pa.table({"k": pa.array(rng.integers(0, 15, nl), pa.int64()),
                  "a": pa.array(rng.integers(0, 100, nl), pa.int64())})
    r = pa.table({"j": pa.array(rng.integers(5, 20, nr), pa.int64()),
                  "b": pa.array(rng.integers(0, 100, nr), pa.int64())})
    got = (full_outer_groupjoin(_ds(l, 6), _ds(r, 6), "k", "j",
                                {"a": pa.int64()}, {"b": pa.int64()})
           .to_pandas())
    got = got.fillna(-1).astype("int64").sort_values(
        ["key", "a", "b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    want = con.execute(
        "SELECT coalesce(k, j) AS key, coalesce(a, -1) AS a, "
        "coalesce(b, -1) AS b FROM l FULL OUTER JOIN r ON k = j "
        "ORDER BY key, a, b").fetchdf().astype("int64").reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))


def test_copartitioned_join_matches_plain_join(tmp_path, ray_session):
    """Shuffle-free bucket join == the global join, and the partitioner /
    generation guards refuse mis-bucketed inputs."""
    import os

    import pytest

    from dataxray.functions.joins import copartitioned_join
    from dataxray.gen import GenConfig, write_dataset
    from dataxray.pipelines.replay import ReplayConfig, replay
    from dataxray.state.manifest import Lake

    cfg = GenConfig(n_urls=120, n_events=1_000, n_shards=4, html_mean=8)
    src = str(tmp_path / "gen")
    write_dataset(src, cfg, parallel=False)
    la, lb = str(tmp_path / "la"), str(tmp_path / "lb")
    for lk in (la, lb):
        replay(os.path.join(src, "events"), lk,
               pages_path=os.path.join(src, "pages.parquet"),
               cfg=ReplayConfig(num_partitions=4))
    out = copartitioned_join(
        Lake(la), Lake(lb), on="url", join_type="inner",
        columns_a=["url", "txn_id"], columns_b=["url", "txn_id"],
        right_suffix="_b")
    got = out.to_pandas().sort_values("url").reset_index(drop=True)
    a = Lake(la).read_all().to_pandas()
    assert len(got) == len(a)  # same key set on both sides, 1:1 join
    assert (got["txn_id"] == got["txn_id_b"]).all()

    # partition-count mismatch refused
    lc = str(tmp_path / "lc")
    replay(os.path.join(src, "events"), lc,
           pages_path=os.path.join(src, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8))
    with pytest.raises(ValueError, match="num_partitions"):
        copartitioned_join(Lake(la), Lake(lc))

    # generation mismatch refused even at equal P (evolve one side 4->8->4)
    Lake(lb).evolve_partitions(8)
    Lake(lb).evolve_partitions(4)
    with pytest.raises(ValueError, match="generation"):
        copartitioned_join(Lake(la), Lake(lb))


def test_lake_lookup_point_get(tmp_path, ray_session):
    """lookup() touches only hashed buckets and returns exactly the live
    requested keys (absent + tombstoned keys yield no row)."""
    import os

    from dataxray.gen import GenConfig, write_dataset
    from dataxray.pipelines.replay import ReplayConfig, replay
    from dataxray.state.manifest import Lake

    cfg = GenConfig(n_urls=100, n_events=800, n_shards=4, html_mean=8)
    src = str(tmp_path / "gen3")
    write_dataset(src, cfg, parallel=False)
    lake_dir = str(tmp_path / "lkup")
    replay(os.path.join(src, "events"), lake_dir,
           pages_path=os.path.join(src, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8))
    lake = Lake(lake_dir)
    all_rows = lake.read_all().to_pandas().set_index("url")
    live = list(all_rows.index[:5])
    got = lake.lookup(live + ["https://definitely-absent.example/x"]) \
        .to_pandas().set_index("url")
    assert sorted(got.index) == sorted(live)
    for u in live:
        assert got.loc[u, "text"] == all_rows.loc[u, "text"]
    assert len(lake.lookup([])) == 0
    cols = lake.lookup(live, columns=["url", "txn_id"])
    assert cols.column_names == ["url", "txn_id"]
