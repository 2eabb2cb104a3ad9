"""dx_* transform semantics vs the reference (file:line cited in transforms.py)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from dataxray.functions.transforms import (
    DxDigest,
    DxFilter,
    DxPad,
    DxReplace,
    DxSubstr,
    TransformChain,
    build_chain,
    register_udf,
)


def T(**cols):
    return pa.table(cols)


# ---- dx_substr (SubstrTransformer.java) ----
def test_substr_basic_clamp_and_null_passthrough():
    t = T(s=pa.array(["abcdef", "ab", None]))
    out = DxSubstr("s", 1, 3).apply(t)
    assert out["s"].to_pylist() == ["bcd", "b", None]


def test_substr_out_of_range_is_error_row():
    t = T(s=pa.array(["abc", "a"]))
    mask = DxSubstr("s", 2, 1).error_mask(t)
    assert mask.to_pylist() == [False, True]  # start(2) > len("a")
    # start == len is legal -> empty string
    out = DxSubstr("s", 3, 1).apply(T(s=pa.array(["abc"])))
    assert out["s"].to_pylist() == [""]


# ---- dx_pad (PadTransformer.java) ----
def test_pad_left_right_multichar_truncate_null():
    t = T(s=pa.array(["abc", "abcdefgh", None]))
    assert DxPad("s", "l", 6, "xy").apply(t)["s"].to_pylist() == ["xyxabc", "abcdef", "xyxyxy"]
    assert DxPad("s", "r", 6, "xy").apply(t)["s"].to_pylist() == ["abcxyx", "abcdef", "xyxyxy"]


def test_pad_bad_type_raises():
    with pytest.raises(ValueError):
        DxPad("s", "m", 3, "x")


# ---- dx_replace (ReplaceTransformer.java) ----
def test_replace_splice_and_tail():
    t = T(s=pa.array(["abcdef", "abc", None]))
    out = DxReplace("s", 2, 2, "XX").apply(t)
    # [2,4) replaced; "abc": start+len >= strlen -> prefix + const only
    assert out["s"].to_pylist() == ["abXXef", "abXX", None]


def test_replace_out_of_range_error():
    mask = DxReplace("s", 4, 1, "Z").error_mask(T(s=pa.array(["abc"])))
    assert mask.to_pylist() == [True]


# ---- dx_digest (DigestTransformer.java) ----
def test_digest_md5_sha1_case_null_as_empty():
    import hashlib

    t = T(s=pa.array(["hello", None]))
    out = DxDigest("s", "md5", "toLowerCase").apply(t)
    assert out["s"].to_pylist() == [
        hashlib.md5(b"hello").hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]
    out2 = DxDigest("s", "sha1", "toUpperCase").apply(t)
    assert out2["s"][0].as_py() == hashlib.sha1(b"hello").hexdigest().upper()


# ---- dx_filter (FilterTransformer.java) ----
def test_filter_like_full_match_and_null():
    t = T(s=pa.array(["en", "english", None]))
    # like drops non-null FULL matches only ("english" is not matched by "en")
    assert DxFilter("s", "like", "en").apply(t)["s"].to_pylist() == ["english", None]
    # not like keeps only non-null full matches (nulls dropped, :303-310)
    assert DxFilter("s", "not like", "en.*").apply(t)["s"].to_pylist() == ["en", "english"]


def test_filter_ordered_never_drops_null():
    t = T(x=pa.array([1.0, 5.0, None]))
    assert DxFilter("x", ">", "2").apply(t)["x"].to_pylist() == [1.0, None]
    assert DxFilter("x", "<=", "1").apply(t)["x"].to_pylist() == [5.0, None]


def test_filter_equal_null_literal():
    t = T(x=pa.array(["a", None]))
    assert DxFilter("x", "=", "null").apply(t)["x"].to_pylist() == ["a"]
    assert DxFilter("x", "=", "a").apply(t)["x"].to_pylist() == [None]
    # != : null kept only when value is "null"
    assert DxFilter("x", "!=", "null").apply(t)["x"].to_pylist() == [None]
    assert DxFilter("x", "!=", "a").apply(t)["x"].to_pylist() == ["a"]


def test_filter_timestamp_as_epoch_long():
    t = T(ts=pa.array([1000, 5000], pa.timestamp("ms")))
    out = DxFilter("ts", ">", "2000").apply(t)
    assert pc.cast(out["ts"], pa.int64()).to_pylist() == [1000]


# ---- chain + registry ----
def test_chain_routes_error_rows_to_dirty(tmp_path):
    import glob

    import pyarrow.parquet as pq

    dirty = str(tmp_path / "d")
    chain = TransformChain([DxSubstr("s", 3, 2)], dirty_dir=dirty)
    out = chain(T(s=pa.array(["abcdef", "x"])))
    assert out["s"].to_pylist() == ["de"]
    files = glob.glob(dirty + "/*.parquet")
    assert sum(pq.read_metadata(f).num_rows for f in files) == 1


def test_build_chain_from_config_and_udf():
    register_udf("upper_s", lambda t: t.set_column(
        t.schema.get_field_index("s"), "s", pc.utf8_upper(t["s"])))
    chain = build_chain([
        {"name": "dx_substr", "parameters": {"columnIndex": 0, "paras": ["0", "3"]}},
        {"name": "upper_s"},
    ])
    assert chain(T(s=pa.array(["hello"])))["s"].to_pylist() == ["HEL"]
    with pytest.raises(ValueError):
        register_udf("dx_evil", lambda t: t)


def test_filter_null_literal_on_numeric_column():
    """'= null' / '!= null' must not parse 'null' as a number (review fix)."""
    t = T(x=pa.array([1.5, None, 2.5]))
    assert DxFilter("x", "=", "null").apply(t)["x"].to_pylist() == [1.5, 2.5]
    assert DxFilter("x", "!=", "null").apply(t)["x"].to_pylist() == [None]
    ts = T(ts=pa.array([1000, None], pa.timestamp("ms")))
    assert DxFilter("ts", "=", "null").apply(ts).num_rows == 1
