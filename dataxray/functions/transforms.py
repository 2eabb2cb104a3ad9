"""The dx_* transform library + UDF registry — DataX's per-record transformer
chain re-expressed as vectorized Arrow batch operations.

Reference semantics reproduced exactly (each op cites its source):

  dx_substr   SubstrTransformer.java:20-64  — substring [start, start+len)
              clamped at the end; null passes through; start > strlen is a
              per-record error (→ dirty side channel).
  dx_pad      PadTransformer.java:20-89     — l/r pad to length with a
              multi-char pad string; truncates to prefix when already longer;
              null treated as "".
  dx_replace  ReplaceTransformer.java:20-65 — splice-replace [start,
              start+len) with a constant; null passes through; start > strlen
              is a per-record error.
  dx_filter   FilterTransformer.java:14-311 — DROP the record when the
              predicate matches. like/'not like' are Java String.matches
              (full-anchored regex, :294-310; null is dropped by 'not like'!);
              </>/<=/>= never drop nulls (:74-76,134-136); '='/'!=' treat the
              literal "null" as the null value (:205-212,255-262). Numeric
              compare for float columns, integral compare for int/date
              columns, lexicographic for string/binary/bool.
  dx_digest   DigestTransformer.java:31-85  — md5/sha1 hex of the column,
              upper/lower; null treated as "".

Differences (documented, not silent): offsets count Unicode codepoints
(Arrow) where Java counts UTF-16 code units — identical for BMP text; regex
syntax is Python's `re`, a close superset of java.util.regex for common
patterns.

A transformer exception makes the record dirty and drops it from the stream
(TransformerExchanger.java:53-127); here per-row error masks route those rows
to the dirty Parquet side channel (errors.py).

The UDF registry mirrors TransformerRegistry.java:28-165: native names are
``dx_*``; user transforms register under any other name (non-dx_ enforced,
:42-165) — the dx_groovy extension point (GroovyTransformer.java:24-88)
becomes "any Python callable on an Arrow table".
"""

from __future__ import annotations

import hashlib
import re
import sys
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import write_dirty

_MAX = sys.maxsize


def _col(table: pa.Table, column: str | int) -> tuple[str, pa.ChunkedArray]:
    """Accept a column name or a DataX-style positional index."""
    if isinstance(column, int):
        name = table.column_names[column]
    else:
        name = column
    return name, table[name]


def _as_str(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return pc.cast(arr, pa.string())


class Transform:
    """A vectorized batch op; ``error_mask`` marks rows that the reference
    would have thrown on (→ dirty)."""

    def error_mask(self, table: pa.Table):  # pa.Array[bool] | None
        return None

    def apply(self, table: pa.Table) -> pa.Table:
        raise NotImplementedError

    def __call__(self, table: pa.Table) -> pa.Table:
        return self.apply(table)


class DxSubstr(Transform):
    """SubstrTransformer.java:20-64."""

    def __init__(self, column: str | int, start: int, length: int):
        self.column, self.start, self.length = column, int(start), int(length)

    def error_mask(self, table):
        name, arr = _col(table, self.column)
        s = _as_str(arr)
        return pc.fill_null(pc.greater(pa.scalar(self.start), pc.utf8_length(s)), False)

    def apply(self, table):
        name, arr = _col(table, self.column)
        s = _as_str(arr)
        out = pc.utf8_slice_codeunits(s, self.start, self.start + self.length)
        return table.set_column(table.schema.get_field_index(name), name, out)


class DxPad(Transform):
    """PadTransformer.java:20-89 — supports multi-char pad strings."""

    def __init__(self, column: str | int, pad_type: str, length: int, pad_string: str):
        if pad_type.lower() not in ("l", "r"):
            raise ValueError(f"dx_pad first para({pad_type}) support l or r")
        self.column, self.pad_type = column, pad_type.lower()
        self.length, self.pad_string = int(length), pad_string

    def apply(self, table):
        name, arr = _col(table, self.column)
        s = pc.fill_null(_as_str(arr), "")
        base = pc.utf8_slice_codeunits(s, 0, self.length)  # truncate-if-longer
        lens = pc.utf8_length(base).combine_chunks().to_numpy(zero_copy_only=False)
        needed = np.maximum(self.length - lens, 0)
        reps = -(-self.length // max(len(self.pad_string), 1))  # ceil
        full = (self.pad_string * reps)[: self.length]
        lookup = np.array([full[:k] for k in range(self.length + 1)], dtype=object)
        pad = pa.array(lookup[needed], pa.string())
        if self.pad_type == "l":
            out = pc.binary_join_element_wise(pad, base, "")
        else:
            out = pc.binary_join_element_wise(base, pad, "")
        return table.set_column(table.schema.get_field_index(name), name, out)


class DxReplace(Transform):
    """ReplaceTransformer.java:20-65."""

    def __init__(self, column: str | int, start: int, length: int, replace_string: str):
        self.column, self.start = column, int(start)
        self.length, self.replace_string = int(length), replace_string

    def error_mask(self, table):
        name, arr = _col(table, self.column)
        s = _as_str(arr)
        return pc.fill_null(pc.greater(pa.scalar(self.start), pc.utf8_length(s)), False)

    def apply(self, table):
        name, arr = _col(table, self.column)
        s = _as_str(arr)
        prefix = pc.utf8_slice_codeunits(s, 0, self.start)
        suffix = pc.utf8_slice_codeunits(s, self.start + self.length, _MAX)
        out = pc.binary_join_element_wise(prefix, self.replace_string, suffix, "")
        return table.set_column(table.schema.get_field_index(name), name, out)


class DxDigest(Transform):
    """DigestTransformer.java:31-85. hashlib per row (no vectorized md5 kernel
    exists); the C digest dominates, and the stage parallelizes across tasks."""

    def __init__(self, column: str | int, digest_type: str, char_type: str,
                 out_column: str | None = None):
        if digest_type.lower() not in ("md5", "sha1"):
            raise ValueError("dx_digest paras index 1 must be md5 or sha1")
        if char_type not in ("toUpperCase", "toLowerCase"):
            raise ValueError("dx_digest paras index 2 must be toUpperCase or toLowerCase")
        self.column, self.digest_type, self.char_type = column, digest_type.lower(), char_type
        self.out_column = out_column  # None = in-place like the reference

    def apply(self, table):
        name, arr = _col(table, self.column)
        s = pc.fill_null(_as_str(arr), "")
        algo = hashlib.md5 if self.digest_type == "md5" else hashlib.sha1
        vals = [algo(v.encode()).hexdigest() for v in s.to_pylist()]
        if self.char_type == "toUpperCase":
            vals = [v.upper() for v in vals]
        out = pa.array(vals, pa.string())
        dest = self.out_column or name
        if dest in table.column_names:
            return table.set_column(table.schema.get_field_index(dest), dest, out)
        return table.append_column(dest, out)


class DxFilter(Transform):
    """FilterTransformer.java:14-311 — drop record when predicate matches."""

    CODES = ("like", "not like", ">", "<", "=", "==", "!=", ">=", "<=")

    def __init__(self, column: str | int, code: str, value: str):
        code = code.lower()
        if code not in self.CODES:
            raise ValueError(f"dx_filter can't support code:{code}")
        if value is None or value == "":
            raise ValueError("dx_filter para 2 can't be null")
        self.column, self.code, self.value = column, code, value

    def keep_mask(self, table: pa.Table) -> pa.Array:
        _, arr = _col(table, self.column)
        code, value = self.code, self.value
        null = pc.is_null(arr)
        if code in ("like", "not like"):
            s = _as_str(arr)
            # Java String.matches = implicitly anchored full match (:294-310)
            m = pc.fill_null(pc.match_substring_regex(s, f"^(?:{value})$"), False)
            if code == "like":
                return pc.or_(null, pc.invert(m))  # drop non-null full matches
            return pc.and_(pc.invert(null), m)  # 'not like' drops nulls too
        if code in ("=", "==", "!="):
            if value.lower() == "null":
                # the literal "null" compares against the null value itself
                # (:205-212, :255-262); never parse it as a number
                if code in ("=", "=="):
                    return pc.invert(null)  # drop nulls, keep the rest
                return null  # '!= null': keep only nulls
            eq = self._equal_mask(arr, value)
            if code in ("=", "=="):
                return pc.or_(null, pc.and_(pc.invert(null), pc.invert(eq)))
            # '!=' with a non-null literal: nulls are dropped (:255-262)
            return pc.and_(pc.invert(null), eq)
        # ordered compares: nulls never dropped (:74-76,134-136)
        cmp = self._ordered_mask(arr, code, value)
        return pc.or_(null, pc.invert(pc.fill_null(cmp, False)))

    def _typed_pair(self, arr, value):
        t = arr.type
        if pa.types.is_floating(t) or pa.types.is_decimal(t):
            return pc.cast(arr, pa.float64()), pa.scalar(float(value))
        if pa.types.is_integer(t):
            return arr, pa.scalar(int(value), t)
        if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
            # DateColumn compares epoch longs (FilterTransformer: LongColumn||DateColumn)
            return pc.cast(arr, pa.int64()), pa.scalar(int(value))
        return _as_str(arr), pa.scalar(str(value))

    def _equal_mask(self, arr, value):
        a, v = self._typed_pair(arr, value)
        return pc.fill_null(pc.equal(a, v), False)

    def _ordered_mask(self, arr, code, value):
        a, v = self._typed_pair(arr, value)
        op = {">": pc.greater, ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}[code]
        return op(a, v)

    def apply(self, table):
        return table.filter(self.keep_mask(table))


# ---------------------------------------------------------------------------
# Registry (TransformerRegistry.java:28-165)
# ---------------------------------------------------------------------------

_NATIVE: dict[str, type | Callable] = {
    "dx_substr": DxSubstr,
    "dx_pad": DxPad,
    "dx_replace": DxReplace,
    "dx_digest": DxDigest,
    "dx_filter": DxFilter,
}
_USER: dict[str, Callable] = {}


def register_udf(name: str, fn: Callable[..., object]) -> None:
    """dx_groovy analog: any callable on a pyarrow.Table (or a factory of
    one). Non-native names must not start with dx_ (TransformerRegistry.java:63-68)."""
    if name.startswith("dx_"):
        raise ValueError("user transformer names must not start with dx_")
    _USER[name] = fn


def resolve(name: str) -> type | Callable:
    if name in _NATIVE:
        return _NATIVE[name]
    if name in _USER:
        return _USER[name]
    raise KeyError(f"no transformer registered under {name!r}")


class _UdfWrapper(Transform):
    def __init__(self, fn: Callable[[pa.Table], pa.Table]):
        self.fn = fn

    def apply(self, table):
        return self.fn(table)


def build_chain(specs: list[dict]) -> "TransformChain":
    """Build a chain from DataX-flavored job config entries:
    {"name": "dx_substr", "parameters": {"columnIndex": 2, "paras": ["1", "5"]}}
    (columnName is accepted in place of columnIndex)."""
    out = []
    for spec in specs:
        name = spec["name"]
        params = spec.get("parameters", {})
        col = params.get("columnName", params.get("columnIndex"))
        paras = params.get("paras", [])
        factory = resolve(name)
        if name in _NATIVE:
            out.append(factory(col, *paras))
        else:
            fn = factory(col, *paras) if (col is not None or paras) else factory
            out.append(fn if isinstance(fn, Transform) else _UdfWrapper(fn))
    return TransformChain(out)


class TransformChain:
    """The transformer-chain executor as one fused map_batches callable.

    Per-record transformer exceptions become dirty rows routed to the side
    channel; dx_filter's first-null short-circuit (drop) is the keep-mask
    (TransformerExchanger.java:53-127, wiring TaskGroupContainer.java:436-441).
    """

    def __init__(self, transforms: list[Transform], dirty_dir: str | None = None):
        self.transforms = transforms
        self.dirty_dir = dirty_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        for t in self.transforms:
            mask = t.error_mask(batch)
            if mask is not None and pc.any(mask).as_py():
                if self.dirty_dir is not None:
                    write_dirty(self.dirty_dir, batch.filter(mask))
                batch = batch.filter(pc.invert(mask))
            batch = t.apply(batch)
        return batch
