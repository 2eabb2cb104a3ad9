"""Change-event validation / decode stage.

Mirrors the reference's transformer-exchanger contract: a record that fails
validation becomes a *dirty record* routed to the side channel and dropped
from the main stream (TransformerExchanger.java:53-127,
BufferedRecordTransformerExchanger.java:97-100) — the pipeline keeps running
and the error budget is enforced at the end (errors.py).

Validation rules (dirty fixture, FIXTURES.md §4):
  * url must be non-null / non-empty,
  * op must be one of {I, U, D},
  * txn_id must be non-null and >= 0 (no txn regression below the epoch),
  * seq must be non-null and >= 0 (a null seq becomes NaN in the LWW
    lexsort and would silently WIN against every same-txn event),
  * I/U events must carry a non-null text payload (D rows are all-null).

Vectorized: one boolean mask per batch via pyarrow.compute — no row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import write_dirty
from ..schema import OP_DELETE, OP_INSERT, OP_UPDATE


def _rules(batch: pa.Table) -> list[tuple[str, pa.Array]]:
    """(reason, ok_mask) per validation rule, all vectorized."""
    rules = [
        ("null_or_empty_url",
         pc.and_(batch["url"].is_valid(), pc.not_equal(batch["url"], ""))),
        ("bad_op",
         pc.is_in(batch["op"], value_set=pa.array([OP_INSERT, OP_UPDATE, OP_DELETE]))),
        ("txn_regression",
         pc.and_(batch["txn_id"].is_valid(), pc.greater_equal(batch["txn_id"], 0))),
    ]
    if "seq" in batch.column_names:
        # a null seq would turn into NaN in the lexsort and order LAST —
        # silently beating every same-txn event — so it must go dirty
        rules.append((
            "null_seq",
            pc.and_(batch["seq"].is_valid(), pc.greater_equal(batch["seq"], 0)),
        ))
    if "text" in batch.column_names:
        rules.append((
            "null_payload",
            pc.or_(pc.equal(batch["op"], OP_DELETE), batch["text"].is_valid()),
        ))
    return [(r, pc.fill_null(m, False)) for r, m in rules]


def valid_mask(batch: pa.Table) -> pa.Array:
    mask = None
    for _, ok in _rules(batch):
        mask = ok if mask is None else pc.and_(mask, ok)
    return mask


def dirty_reasons(batch: pa.Table) -> pa.Array:
    """First failing rule per row (the reference attaches an error message to
    every dirty record, TaskPluginCollector.collectDirtyRecord)."""
    reason = pa.nulls(len(batch), pa.string())
    for name, ok in reversed(_rules(batch)):
        reason = pc.if_else(ok, reason, pa.scalar(name, pa.string()))
    return reason


class Validate:
    """map_batches callable: split valid/dirty; dirty rows → side Parquet.

    Plain-function friendly but shipped as a class so the dirty_dir config is
    serialized once per task, matching the reference's per-task plugin init
    lifecycle (dataxPluginDev.md:33-41).
    """

    def __init__(self, dirty_dir: str | None = None):
        self.dirty_dir = dirty_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = valid_mask(batch)
        if pc.all(mask).as_py() in (True, None):
            return batch
        if self.dirty_dir is not None:
            bad = batch.filter(pc.invert(mask))
            bad = bad.append_column("_dirty_reason",
                                    dirty_reasons(batch).filter(pc.invert(mask)))
            write_dirty(self.dirty_dir, bad)
        return batch.filter(mask)
