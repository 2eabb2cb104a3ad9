"""Crash mid-commit, then resume: final state must equal the oracle.

Simulates a driver death after K of P partition commits (the window the
exactly-once protocol must cover: some manifests written, staging for the
rest orphaned). Resume must (a) re-apply only what's missing per partition
watermark and (b) re-fold the base pages into partitions whose bootstrap
never committed (bootstrap_pages in lake _meta)."""

import os

import pyarrow as pa
import pytest

from dataxray.gen import GenConfig, generate_event_shard, generate_pages, sequential_oracle, write_dataset
from dataxray.pipelines.replay import ReplayConfig, replay
from dataxray.state.manifest import Lake

CFG = GenConfig(n_urls=400, n_events=4_000, n_shards=4, html_mean=32)

# "mocks3" runs the identical protocol through ObjectLakeFS: staged-object
# put + server-side copy + manifest PUT, no rename anywhere (lakefs.py)
SCHEMES = ["", "mocks3://"]


@pytest.mark.parametrize("scheme", SCHEMES)
def test_partial_commit_then_resume_matches_oracle(tmp_path, monkeypatch, scheme):
    d = str(tmp_path / "data")
    write_dataset(d, CFG, parallel=False)
    lake_dir = scheme + str(tmp_path / "lake")

    # crash after 3 commits: monkeypatch commit to stop committing (the rest
    # of the driver loop still runs, matching a killed process whose staged
    # files are orphaned but whose later manifests never land)
    from dataxray.state import manifest as M

    real_commit = M.Lake.commit
    calls = {"n": 0}

    def flaky_commit(self, *a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            return "skipped"  # pretend the process died before these landed
        return real_commit(self, *a, **k)

    monkeypatch.setattr(M.Lake, "commit", flaky_commit)
    replay(os.path.join(d, "events"), lake_dir, pages_path=os.path.join(d, "pages.parquet"),
           cfg=ReplayConfig(num_partitions=8))
    monkeypatch.setattr(M.Lake, "commit", real_commit)
    assert len(Lake(lake_dir).watermarks()) == 3

    # resume WITHOUT passing pages — lake meta must supply the bootstrap path
    rep = replay(os.path.join(d, "events"), lake_dir, cfg=ReplayConfig(num_partitions=8))
    assert rep.partitions_committed == 5

    pages = generate_pages(CFG)
    events = pa.concat_tables(
        [generate_event_shard(CFG, s) for s in range(CFG.n_shards)],
        promote_options="permissive",
    )
    oracle = sequential_oracle(pages, events)
    got = Lake(lake_dir).read_all().to_pandas().sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == oracle["url"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()
