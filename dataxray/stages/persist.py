"""Multi-pass persistence policy: object store vs staged parquet.

Several operators consume an intermediate Dataset more than once (a dedup
corpus feeds a df-counting pass, a prefix explode, and a verify filter).
``Dataset.materialize()`` pins the blocks in the object store — correct
and fast single-node (plasma spills to disk under pressure), but at
100 TB a multi-pass corpus must not lean on plasma spill: spill files are
node-local and non-resumable, and an evicted block re-runs its whole
upstream pipeline. Above a byte budget the blocks are STAGED to parquet
on a real filesystem instead and re-read per pass — the write streams, so
peak object-store usage stays at pipeline-buffer size, and every pass is
an ordinary pruned parquet scan any worker/node can serve.

Budget source: explicit argument, else the DATAXRAY_STAGE_BUDGET_BYTES
environment variable; unset means "materialize" (today's single-node
default). budget <= 0 forces staging unconditionally (the cluster-scale
setting, and what the pytest uses to exercise the staged path).
"""

from __future__ import annotations

import os
import tempfile

_ENV = "DATAXRAY_STAGE_BUDGET_BYTES"

# staged dirs created this process (tests observe; /tmp owns cleanup —
# consumers are lazy Datasets whose lineage references the staged files,
# so eager deletion would break them)
STAGED_DIRS: list[str] = []


def _budget_from_env() -> int | None:
    v = os.environ.get(_ENV)
    return int(v) if v not in (None, "") else None


def persist_multi_pass(ds, budget_bytes: int | None | str = "env",
                       label: str = "corpus", stage_root: str | None = None):
    """Make ``ds`` safely consumable by multiple downstream passes.

    - budget None (default when the env var is unset): materialize() —
      blocks pinned in the (spill-backed) object store.
    - budget <= 0: always stage to parquet (streaming write) and re-read.
    - budget > 0: materialize, then DEMOTE to the stage if the pinned
      blocks exceed the budget (the single-node middle ground: small
      corpora stay zero-copy in plasma, big ones move to disk).
    """
    import ray.data

    if budget_bytes == "env":
        budget_bytes = _budget_from_env()
    if budget_bytes is None:
        return ds.materialize()
    if budget_bytes > 0:
        mds = ds.materialize()
        if (mds.size_bytes() or 0) <= budget_bytes:
            return mds
        ds = mds  # over budget: stream the pinned blocks out to the stage
    d = tempfile.mkdtemp(prefix=f"dxr-stage-{label}-", dir=stage_root)
    STAGED_DIRS.append(d)
    ds.write_parquet(d)
    return ray.data.read_parquet(d)
