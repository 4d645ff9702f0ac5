"""Property-based tests (hypothesis) for the bit-level codecs: Avro
datum encoding, single-value binary serde, zigzag varints, murmur3
invariants, transform algebraic properties."""

from __future__ import annotations

import io
import math
from datetime import date, timedelta
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_go_distributed_spark.iceberg import avro as A
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.conversions import from_bytes, to_bytes
from iceberg_go_distributed_spark.iceberg.transforms import (
    BucketTransform,
    DayTransform,
    MonthTransform,
    TruncateTransform,
    YearTransform,
    murmur3_32,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
I32 = st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1)


@given(I64)
def test_zigzag_roundtrip(v):
    out = io.BytesIO()
    A._write_long(out, v)
    out.seek(0)
    assert A._read_long(out) == v


_REC_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "long"}},
        {"name": "d", "type": "bytes"},
        {"name": "e", "type": "double"},
        {"name": "f", "type": "boolean"},
    ],
}

_rec = st.fixed_dictionaries(
    {
        "a": I64,
        "b": st.one_of(st.none(), st.text(max_size=40)),
        "c": st.lists(I64, max_size=8),
        "d": st.binary(max_size=32),
        "e": st.floats(allow_nan=False, allow_infinity=True, width=64),
        "f": st.booleans(),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_rec, max_size=12), st.sampled_from(["null", "deflate"]))
def test_avro_ocf_roundtrip(records, codec):
    buf = io.BytesIO()
    A.write_ocf(buf, _REC_SCHEMA, records, codec=codec)
    buf.seek(0)
    _, _, got = A.read_ocf(buf)
    assert got == records


@given(I64)
def test_long_serde_roundtrip(v):
    assert from_bytes(ty.LongType(), to_bytes(ty.LongType(), v)) == v


@given(I32)
def test_int_serde_roundtrip(v):
    assert from_bytes(ty.IntegerType(), to_bytes(ty.IntegerType(), v)) == v


@given(st.floats(width=64, allow_nan=False))
def test_double_serde_roundtrip(v):
    assert from_bytes(ty.DoubleType(), to_bytes(ty.DoubleType(), v)) == v


@given(st.text(max_size=60))
def test_string_serde_roundtrip(v):
    assert from_bytes(ty.StringType(), to_bytes(ty.StringType(), v)) == v


@given(
    st.decimals(
        min_value=Decimal("-9999999999.99"),
        max_value=Decimal("9999999999.99"),
        places=2,
    )
)
def test_decimal_serde_roundtrip(v):
    t = ty.DecimalType(12, 2)
    assert from_bytes(t, to_bytes(t, v)) == v


@given(st.binary(max_size=64))
def test_murmur3_deterministic_and_u32(data):
    h1, h2 = murmur3_32(data), murmur3_32(data)
    assert h1 == h2
    assert 0 <= h1 < (1 << 32)


@given(I64, st.integers(min_value=1, max_value=1024))
def test_bucket_range(v, n):
    b = BucketTransform(n).apply(v, ty.LongType())
    assert 0 <= b < n


@given(I64, st.integers(min_value=1, max_value=10_000))
def test_truncate_int_properties(v, w):
    t = TruncateTransform(w).apply(v, ty.LongType())
    # floored to a multiple of w, never above v, within w of v
    assert t % w == 0
    assert t <= v < t + w


@given(st.integers(min_value=-200_000, max_value=200_000))
def test_time_transforms_consistent(days):
    """year/month/day transforms must agree with Python's calendar."""
    d = date(1970, 1, 1) + timedelta(days=days)
    assert DayTransform().apply(days, ty.DateType()) == days
    assert YearTransform().apply(days, ty.DateType()) == d.year - 1970
    assert MonthTransform().apply(days, ty.DateType()) == (d.year - 1970) * 12 + d.month - 1


@given(st.integers(min_value=-200_000, max_value=200_000))
def test_month_year_order_preserving(days):
    m1 = MonthTransform().apply(days, ty.DateType())
    m2 = MonthTransform().apply(days + 40, ty.DateType())
    assert m1 <= m2
    y1 = YearTransform().apply(days, ty.DateType())
    y2 = YearTransform().apply(days + 400, ty.DateType())
    assert y1 <= y2
