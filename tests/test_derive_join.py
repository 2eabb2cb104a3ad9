"""Join-shaped incremental view (pipelines.derive.incremental_join_stats):
a copartitioned-join-derived aggregate maintained from BOTH lakes' pre-image
change feeds must equal the full re-join, across inserts/updates/deletes on
either side, at O(changed keys) per refresh.

Reference parity note: the reference engine re-reads its source every job
(no derived-view maintenance, no joins); this is the Ray-native surface the
CDC core makes possible.
"""

import os
import shutil

import pyarrow as pa
import pytest

from dataxray.gen import GenConfig, write_dataset
from dataxray.pipelines.derive import (incremental_join_stats,
                                       joined_group_stats)
from dataxray.pipelines.replay import ReplayConfig, replay
from dataxray.state.manifest import Lake

pytestmark = pytest.mark.parametrize("scheme", ["", "mocks3://"])


def _two_epoch_lake(tmp_path, scheme, name: str, seed: int,
                    num_partitions: int = 8) -> tuple[Lake, int]:
    """Two-epoch history lake from a generated event WAL (same url key
    space for every seed — url ids are [0, n_urls))."""
    cfg = GenConfig(n_urls=150, n_events=1_500, n_shards=4, html_mean=32,
                    zipf_s=1.2, seed=seed)
    d = str(tmp_path / f"data-{name}")
    write_dataset(d, cfg, parallel=False)
    lake = f"{scheme}{tmp_path / ('lake-' + name)}"
    epochs = str(tmp_path / f"epochs-{name}")
    os.makedirs(epochs)
    files = sorted(os.listdir(os.path.join(d, "events")))
    rcfg = ReplayConfig(num_partitions=num_partitions, history=True)
    for f in files[:2]:
        shutil.copy(os.path.join(d, "events", f), os.path.join(epochs, f))
    replay(epochs, lake, pages_path=os.path.join(d, "pages.parquet"),
           cfg=rcfg)
    thr = min(Lake(lake).watermarks().values())
    for f in files[2:]:
        shutil.copy(os.path.join(d, "events", f), os.path.join(epochs, f))
    replay(epochs, lake, cfg=rcfg)
    return Lake(lake), thr


def test_incremental_join_equals_full(tmp_path, scheme):
    """Base join-agg at the epoch-1 snapshots + signed changed-key join
    deltas from both feeds == full re-join of the final states."""
    la, thr_a = _two_epoch_lake(tmp_path, scheme, "a", seed=42)
    lb, thr_b = _two_epoch_lake(tmp_path, scheme, "b", seed=7)

    inc = incremental_join_stats(la, lb, since_a=thr_a, since_b=thr_b)
    full = joined_group_stats(la, lb)
    assert inc.to_pydict() == full.to_pydict()
    assert len(inc) > 0
    assert inc.schema.names == ["lang", "n_pairs", "sum_len"]
    assert inc["n_pairs"].type == pa.int64()

    # churn is real on both sides: each feed carries pre-image updates
    import ray

    for lk, thr in ((la, thr_a), (lb, thr_b)):
        feed = pa.concat_tables(
            [t for t in ray.get(lk.changes(since_txn=thr, pre_images=True)
                                .to_arrow_refs()) if len(t)],
            promote_options="permissive")
        kinds = set(feed["_change_type"].to_pylist())
        assert {"update_preimage", "update_postimage"} <= kinds


def test_incremental_join_noop_delta(tmp_path, scheme):
    """A refresh with since == current watermark applies an empty delta and
    still equals the full join (idempotent replay of the view)."""
    la, _ = _two_epoch_lake(tmp_path, scheme, "na", seed=1)
    lb, _ = _two_epoch_lake(tmp_path, scheme, "nb", seed=2)
    cur_a = max(la.watermarks().values())
    cur_b = max(lb.watermarks().values())
    inc = incremental_join_stats(la, lb, since_a=cur_a, since_b=cur_b)
    full = joined_group_stats(la, lb)
    assert inc.to_pydict() == full.to_pydict()


def test_incremental_join_base_carried_forward(tmp_path, scheme):
    """A maintained view never re-reads its base: passing the epoch-1
    aggregate as ``base`` produces the same result as recomputing it."""
    la, thr_a = _two_epoch_lake(tmp_path, scheme, "ca", seed=3)
    lb, thr_b = _two_epoch_lake(tmp_path, scheme, "cb", seed=4)
    base = joined_group_stats(la, lb, as_of_a=thr_a, as_of_b=thr_b)
    inc = incremental_join_stats(la, lb, since_a=thr_a, since_b=thr_b,
                                 base=base)
    full = joined_group_stats(la, lb)
    assert inc.to_pydict() == full.to_pydict()


def test_join_view_refuses_mismatched_bucketing(tmp_path, scheme):
    """Co-bucketing is load-bearing: different partition counts must be
    refused (a silent mis-bucketed join would drop matches)."""
    la, thr_a = _two_epoch_lake(tmp_path, scheme, "ga", seed=5)
    lb, thr_b = _two_epoch_lake(tmp_path, scheme, "gb", seed=6,
                                num_partitions=4)
    with pytest.raises(ValueError, match="num_partitions"):
        incremental_join_stats(la, lb, since_a=thr_a, since_b=thr_b)
    with pytest.raises(ValueError, match="num_partitions"):
        joined_group_stats(la, lb)


def test_materialized_join_view_across_epochs(tmp_path, scheme):
    """MaterializedJoinStats: refresh() after each epoch == full re-join;
    replayed refresh is a no-op; a partition evolution on the lakes
    triggers a rebuild (generation mismatch) and stays correct."""
    from dataxray.pipelines.derive import MaterializedJoinStats

    # build both lakes epoch-by-epoch so the view really refreshes from
    # the change feeds, not from a one-shot build
    lakes = []
    for name, seed in (("va", 11), ("vb", 12)):
        cfg = GenConfig(n_urls=150, n_events=1_500, n_shards=4,
                        html_mean=32, zipf_s=1.2, seed=seed)
        d = str(tmp_path / f"data-{name}")
        write_dataset(d, cfg, parallel=False)
        lakes.append((name, d,
                      sorted(os.listdir(os.path.join(d, "events")))))
    rcfg = ReplayConfig(num_partitions=8, history=True)

    def apply(name, d, files, upto):
        epochs = str(tmp_path / f"ve-{name}")
        os.makedirs(epochs, exist_ok=True)
        for f in files[:upto]:
            if not os.path.exists(os.path.join(epochs, f)):
                shutil.copy(os.path.join(d, "events", f),
                            os.path.join(epochs, f))
        lake = f"{scheme}{tmp_path / ('vlake-' + name)}"
        replay(epochs, lake,
               pages_path=(os.path.join(d, "pages.parquet")
                           if upto <= 2 else None), cfg=rcfg)
        return Lake(lake)

    # keep ONE Lake object pair for the view's lifetime (generation is
    # cached per object; evolve below must invalidate the view's own pair)
    la = apply(*lakes[0], upto=2)
    lb = apply(*lakes[1], upto=2)
    view = MaterializedJoinStats(la, lb, name="js")
    v1 = view.refresh()  # first build = full at epoch 1
    assert v1.to_pydict() == joined_group_stats(la, lb).to_pydict()

    apply(*lakes[0], upto=4)
    apply(*lakes[1], upto=4)
    v2 = view.refresh()  # incremental from both feeds
    full2 = joined_group_stats(la, lb)
    assert v2.to_pydict() == full2.to_pydict()
    assert view.meta()["as_of_a"] == max(la.watermarks().values())

    v3 = view.refresh()  # idempotent replay: no-op read
    assert v3.to_pydict() == full2.to_pydict()

    # evolve BOTH lakes (a one-sided evolution is refused by the
    # co-bucketing guard) -> generation mismatch -> rebuild
    la.evolve_partitions(4)
    lb.evolve_partitions(4)
    v4 = view.refresh()
    assert v4.to_pydict() == joined_group_stats(la, lb).to_pydict()
    assert view.meta()["generation_a"] == la.generation()
