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
  * I/U events must carry a non-null text payload (D rows are all-null).

Vectorized: one boolean mask per batch via pyarrow.compute — no row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..errors import write_dirty
from ..schema import OP_DELETE, OP_INSERT, OP_UPDATE


def valid_mask(batch: pa.Table) -> pa.Array:
    url_ok = pc.and_(batch["url"].is_valid(), pc.not_equal(batch["url"], ""))
    op_ok = pc.is_in(batch["op"], value_set=pa.array([OP_INSERT, OP_UPDATE, OP_DELETE]))
    txn_ok = pc.and_(batch["txn_id"].is_valid(), pc.greater_equal(batch["txn_id"], 0))
    mask = pc.and_(pc.and_(url_ok, op_ok), txn_ok)
    if "text" in batch.column_names:
        payload_ok = pc.or_(pc.equal(batch["op"], OP_DELETE), batch["text"].is_valid())
        mask = pc.and_(mask, pc.fill_null(payload_ok, False))
    return pc.fill_null(mask, False)


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
            write_dirty(self.dirty_dir, batch.filter(pc.invert(mask)))
        return batch.filter(mask)
