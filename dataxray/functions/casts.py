"""ColumnCast parity — the reference's pull-based cast surface as a
vectorized batch stage.

Reference semantics reproduced:
  * StringCast config (ColumnCast.java:42-77): job-level ``datetimeFormat``
    ("yyyy-MM-dd HH:mm:ss"), ``dateFormat`` ("yyyy-MM-dd"), ``timeFormat``
    ("HH:mm:ss"), ``extraFormats``; string→date tries datetime, then date,
    then time, then extras (ColumnCast.java:79-109).
  * StringColumn.asLong (StringColumn.java:62-78): numeric string →
    integer via decimal, overflow-validated (OverFlowUtil.java:28) — rows
    that fail become dirty records (cast failure → transformer exception →
    dirty, SURVEY.md §1.2 mapping table).
  * StringColumn.asBoolean (StringColumn.java:123-139): only
    "true"/"false" case-insensitive; anything else is a cast error.
  * StringColumn.asDouble: "NaN"/"Infinity"/"-Infinity" literals honored.
  * null always passes through as null (every asX returns null on null).

Java's yyyy-MM-dd patterns are translated to strptime equivalents for the
common tokens; timezone handling is naive-UTC (Arrow/DuckDB convention —
the reference's GMT+8 default is a config knob we keep but do not apply to
naive timestamps).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_JAVA_TO_STRPTIME = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"), ("SSS", "%f"),
]


def java_format_to_strptime(fmt: str) -> str:
    for j, p in _JAVA_TO_STRPTIME:
        fmt = fmt.replace(j, p)
    return fmt


@dataclass(frozen=True)
class CastConfig:
    """common.column.* analog (core.json defaults)."""

    datetime_format: str = "yyyy-MM-dd HH:mm:ss"
    date_format: str = "yyyy-MM-dd"
    time_format: str = "HH:mm:ss"
    extra_formats: tuple[str, ...] = ()
    time_zone: str = "GMT+8"  # retained for config parity; not applied (naive ts)
    encoding: str = "utf-8"

    @property
    def parse_order(self) -> list[str]:
        return [java_format_to_strptime(f) for f in
                (self.datetime_format, self.date_format, self.time_format,
                 *self.extra_formats)]


class CastError(ValueError):
    pass


def string_to_timestamp(arr: pa.ChunkedArray | pa.Array, cfg: CastConfig = CastConfig()):
    """String→date with the reference's try-each-format order. Returns
    (timestamp_ms array, error_mask). Vectorized per format via
    pc.strptime; rows no format accepts are errors."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = pa.nulls(len(arr), pa.timestamp("ms"))
    resolved = np.array(arr.is_null().to_pylist())  # nulls pass through
    for fmt in cfg.parse_order:
        if resolved.all():
            break
        try:
            parsed = pc.strptime(arr, format=fmt, unit="ms", error_is_null=True)
        except pa.ArrowInvalid:  # pragma: no cover
            continue
        newly = np.array(parsed.is_valid().to_pylist()) & ~resolved
        if newly.any():
            out = pc.if_else(pa.array(newly), parsed, out)
            resolved |= newly
    return out, pa.array(~resolved)


def string_to_long(arr: pa.ChunkedArray | pa.Array):
    """String→int64 via decimal (accepts "12.0"), int64-overflow checked.
    Returns (int64 array, error_mask)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = np.zeros(len(arr), dtype=np.int64)
    err = np.zeros(len(arr), dtype=bool)
    for i, s in enumerate(arr.to_pylist()):
        if s is None:
            continue
        try:
            from decimal import Decimal

            d = Decimal(s.strip())
            v = int(d)
            if not (-(1 << 63) <= v < (1 << 63)):
                raise OverflowError
            vals[i] = v
        except Exception:
            err[i] = True
    out = pa.array(vals, pa.int64(), mask=np.array(arr.is_null().to_pylist()) | err)
    return out, pa.array(err)


def string_to_double(arr: pa.ChunkedArray | pa.Array):
    """String→float64; NaN/Infinity literals honored (StringColumn.asDouble)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # Arrow's cast accepts NaN/Infinity spellings; failures -> error rows
    err = np.zeros(len(arr), dtype=bool)
    vals = np.zeros(len(arr), dtype=np.float64)
    for i, s in enumerate(arr.to_pylist()):
        if s is None:
            continue
        try:
            vals[i] = float(s)
        except ValueError:
            err[i] = True
    out = pa.array(vals, pa.float64(), mask=np.array(arr.is_null().to_pylist()) | err)
    return out, pa.array(err)


def string_to_bool(arr: pa.ChunkedArray | pa.Array):
    """Only 'true'/'false' case-insensitive (StringColumn.java:123-139)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    is_true = pc.equal(low, "true")
    is_false = pc.equal(low, "false")
    err = pc.and_(pc.invert(pc.or_(is_true, is_false)), arr.is_valid())
    out = pc.if_else(arr.is_valid(), is_true, pa.scalar(None, pa.bool_()))
    return out, err


_CASTERS = {
    "date": lambda arr, cfg: string_to_timestamp(arr, cfg),
    "long": lambda arr, cfg: string_to_long(arr),
    "double": lambda arr, cfg: string_to_double(arr),
    "bool": lambda arr, cfg: string_to_bool(arr),
    "string": lambda arr, cfg: (pc.cast(arr, pa.string()), pa.array(np.zeros(len(arr), bool))),
    "bytes": lambda arr, cfg: (pc.cast(pc.cast(arr, pa.string()), pa.large_binary()),
                               pa.array(np.zeros(len(arr), bool))),
}


class CastColumns:
    """map_batches stage: cast listed columns to target types; rows failing
    any cast route to the dirty side channel (cast failure → dirty record,
    the transformer-exception contract)."""

    def __init__(self, spec: dict[str, str], cfg: CastConfig = CastConfig(),
                 dirty_dir: str | None = None):
        unknown = set(v for v in spec.values()) - set(_CASTERS)
        if unknown:
            raise ValueError(f"unsupported cast targets: {sorted(unknown)}")
        self.spec = spec
        self.cfg = cfg
        self.dirty_dir = dirty_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..errors import write_dirty

        err_total = np.zeros(len(batch), dtype=bool)
        casted: dict[str, pa.Array] = {}
        for col, target in self.spec.items():
            out, err = _CASTERS[target](batch[col], self.cfg)
            casted[col] = out
            err_total |= np.array(
                err.to_pylist() if isinstance(err, (pa.Array, pa.ChunkedArray)) else err
            )
        if err_total.any():
            if self.dirty_dir is not None:
                write_dirty(self.dirty_dir, batch.filter(pa.array(err_total)))
            keep = pa.array(~err_total)
            batch = batch.filter(keep)
            casted = {c: a.filter(keep) for c, a in casted.items()}
        for col, arr in casted.items():
            batch = batch.set_column(batch.schema.get_field_index(col), col, arr)
        return batch
