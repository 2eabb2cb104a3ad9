"""Property tests: vectorized dx_* transforms vs direct per-row Python
models of the Java reference semantics (SubstrTransformer.java:40-64,
PadTransformer.java:50-89, ReplaceTransformer.java:40-65,
FilterTransformer.java ordered/equality rules)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dataxray.functions.transforms import DxFilter, DxPad, DxReplace, DxSubstr

texts = st.lists(
    st.one_of(st.none(), st.text(alphabet=st.characters(codec="ascii",
                                                        categories=["L", "N", "P", "Z"]),
                                 max_size=12)),
    min_size=1, max_size=20,
)


def model_substr(v, start, length):
    if v is None:
        return v, False
    if start > len(v):
        return v, True  # reference throws -> dirty
    end = len(v) if start + length >= len(v) else start + length
    return v[start:end], False


def model_pad(v, pad_type, length, pad_string):
    v = v or ""
    if length <= len(v):
        return v[:length]
    fill, need = "", length - len(v)
    while need > 0:
        take = pad_string[:need]
        fill += take
        need -= len(take)
    return fill + v if pad_type == "l" else v + fill


def model_replace(v, start, length, rep):
    if v is None:
        return v, False
    if start > len(v):
        return v, True
    if start + length >= len(v):
        return v[:start] + rep, False
    return v[:start] + rep + v[start + length:], False


@settings(max_examples=60, deadline=None)
@given(vals=texts, start=st.integers(0, 6), length=st.integers(0, 6))
def test_substr_matches_model(vals, start, length):
    t = pa.table({"s": pa.array(vals, pa.string())})
    op = DxSubstr("s", start, length)
    mask = op.error_mask(t).to_pylist()
    out = op.apply(t.filter(pa.array([not m for m in mask])))["s"].to_pylist()
    expect = [model_substr(v, start, length) for v in vals]
    assert mask == [e[1] for e in expect]
    assert out == [e[0] for e in expect if not e[1]]


@settings(max_examples=60, deadline=None)
@given(vals=texts, pad_type=st.sampled_from(["l", "r"]),
       length=st.integers(0, 10),
       pad_string=st.text(alphabet="xyz#", min_size=1, max_size=3))
def test_pad_matches_model(vals, pad_type, length, pad_string):
    t = pa.table({"s": pa.array(vals, pa.string())})
    out = DxPad("s", pad_type, length, pad_string).apply(t)["s"].to_pylist()
    assert out == [model_pad(v, pad_type, length, pad_string) for v in vals]


@settings(max_examples=60, deadline=None)
@given(vals=texts, start=st.integers(0, 6), length=st.integers(0, 6),
       rep=st.text(alphabet="AB", max_size=3))
def test_replace_matches_model(vals, start, length, rep):
    t = pa.table({"s": pa.array(vals, pa.string())})
    op = DxReplace("s", start, length, rep)
    mask = op.error_mask(t).to_pylist()
    out = op.apply(t.filter(pa.array([not m for m in mask])))["s"].to_pylist()
    expect = [model_replace(v, start, length, rep) for v in vals]
    assert mask == [e[1] for e in expect]
    assert out == [e[0] for e in expect if not e[1]]


@settings(max_examples=60, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
                                                    allow_infinity=False,
                                                    width=32)),
                     min_size=1, max_size=20),
       code=st.sampled_from([">", ">=", "<", "<=", "=", "!="]),
       threshold=st.integers(-5, 5))
def test_filter_numeric_matches_model(vals, code, threshold):
    t = pa.table({"x": pa.array(vals, pa.float64())})
    out = DxFilter("x", code, str(threshold)).apply(t)["x"].to_pylist()

    def keep(v):
        if v is None:
            return code in (">", ">=", "<", "<=", "=", "==")  # only '!=' drops nulls
        drop = {
            ">": v > threshold, ">=": v >= threshold,
            "<": v < threshold, "<=": v <= threshold,
            "=": v == threshold, "!=": v != threshold,
        }[code]
        return not drop

    assert out == [v for v in vals if keep(v)]
