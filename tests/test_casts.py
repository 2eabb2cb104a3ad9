"""ColumnCast parity tests (ColumnCast.java parse order, StringColumn cast
rules — see functions/casts.py header)."""

import numpy as np
import pyarrow as pa
import pytest

from dataxray.functions.casts import (
    CastColumns,
    CastConfig,
    java_format_to_strptime,
    string_to_bool,
    string_to_double,
    string_to_long,
    string_to_timestamp,
)


def test_java_format_translation():
    assert java_format_to_strptime("yyyy-MM-dd HH:mm:ss") == "%Y-%m-%d %H:%M:%S"
    assert java_format_to_strptime("yyyy/MM/dd") == "%Y/%m/%d"


def test_string_to_timestamp_try_order():
    arr = pa.array(["2024-03-01 10:20:30", "2024-03-01", None, "nonsense"])
    out, err = string_to_timestamp(arr)
    vals = out.to_pylist()
    assert str(vals[0]) == "2024-03-01 10:20:30"
    assert str(vals[1]) == "2024-03-01 00:00:00"  # dateFormat fallback
    assert vals[2] is None and err.to_pylist() == [False, False, False, True]


def test_extra_formats():
    cfg = CastConfig(extra_formats=("dd.MM.yyyy",))
    out, err = string_to_timestamp(pa.array(["31.12.2023"]), cfg)
    assert str(out[0].as_py()).startswith("2023-12-31")
    assert err.to_pylist() == [False]


def test_string_to_long_decimal_and_overflow():
    out, err = string_to_long(pa.array(["42", "12.0", "1e2", None, "x", str(1 << 70)]))
    assert out.to_pylist()[:3] == [42, 12, 100]
    assert err.to_pylist() == [False, False, False, False, True, True]


def test_string_to_double_literals():
    out, err = string_to_double(pa.array(["1.5", "NaN", "Infinity", "-Infinity", "z"]))
    v = out.to_pylist()
    assert v[0] == 1.5 and np.isnan(v[1]) and v[2] == float("inf") and v[3] == float("-inf")
    assert err.to_pylist() == [False, False, False, False, True]


def test_string_to_bool_strict():
    out, err = string_to_bool(pa.array(["true", "FALSE", "1", None]))
    assert out.to_pylist()[:2] == [True, False]
    assert err.to_pylist() == [False, False, True, False]


def test_cast_columns_stage_routes_dirty(tmp_path):
    import glob

    import pyarrow.parquet as pq

    dirty = str(tmp_path / "d")
    stage = CastColumns({"n": "long", "ts": "date"}, dirty_dir=dirty)
    t = pa.table({
        "n": ["1", "2", "bad"],
        "ts": ["2024-01-01", "2024-01-02 03:04:05", "2024-01-03"],
    })
    out = stage(t)
    assert out["n"].to_pylist() == [1, 2]
    assert out.schema.field("ts").type == pa.timestamp("ms")
    n_dirty = sum(pq.read_metadata(f).num_rows for f in glob.glob(dirty + "/*.parquet"))
    assert n_dirty == 1


def test_cast_unknown_target_rejected():
    with pytest.raises(ValueError):
        CastColumns({"x": "decimal999"})
