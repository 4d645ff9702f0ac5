"""Transform semantics vs the reference's golden values
(transforms_test.go:150-192) and the Iceberg spec's published
bucket-hash test vectors (spec "Appendix B: 32-bit Hash Requirements")."""

from __future__ import annotations

import uuid
from datetime import date, datetime, timezone
from decimal import Decimal

import pytest

from iceberg_go_distributed_spark.iceberg import transforms as T
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.conversions import (
    date_to_days,
    datetime_to_micros,
)


def test_murmur3_known_vectors():
    # Iceberg spec Appendix B published values
    assert T.murmur3_32((34).to_bytes(8, "little")) & 0xFFFFFFFF == 2017239379
    assert T.murmur3_32(b"iceberg") == 1210000089


def test_bucket_golden_reference():
    # transforms_test.go:188 — bucket[128]("foobar") == 61
    assert T.BucketTransform(128).apply("foobar", ty.StringType()) == 61


@pytest.mark.parametrize(
    "value,src,expected_hash",
    [
        (34, ty.IntegerType(), 2017239379),
        (34, ty.LongType(), 2017239379),
        (date(2017, 11, 16), ty.DateType(), -653330422),
        (81068000000, ty.TimeType(), -662762989),  # 22:31:08 in µs
        (
            datetime_to_micros(datetime(2017, 11, 16, 22, 31, 8)),
            ty.TimestampType(),
            -2047944441,
        ),
        (Decimal("14.20"), ty.DecimalType(9, 2), -500754589),
        ("iceberg", ty.StringType(), 1210000089),
        (
            uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7"),
            ty.UUIDType(),
            1488055340,
        ),
    ],
)
def test_bucket_spec_hash_vectors(value, src, expected_hash):
    """The spec publishes the raw murmur3 hash; bucket = (h & MaxInt32) % N."""
    n = 100000
    expected_bucket = (expected_hash & T.MAX_INT32) % n
    assert T.BucketTransform(n).apply(value, src) == expected_bucket


def test_time_transforms_golden():
    # transforms_test.go:150-176: ts = 1971-02-10 10:20:30.004 UTC
    ts = datetime_to_micros(datetime(1971, 2, 10, 10, 20, 30, 4000))
    assert T.HourTransform().apply(ts, ty.TimestampType()) == (365 + 40) * 24 + 10
    assert T.DayTransform().apply(ts, ty.TimestampType()) == 365 + 40
    assert T.MonthTransform().apply(ts, ty.TimestampType()) == 13
    assert T.YearTransform().apply(ts, ty.TimestampType()) == 1


def test_time_transforms_negative():
    # floor semantics before the epoch
    ts = datetime_to_micros(datetime(1969, 12, 31, 23, 0, 0))
    assert T.DayTransform().apply(ts, ty.TimestampType()) == -1
    assert T.HourTransform().apply(ts, ty.TimestampType()) == -1
    assert T.MonthTransform().apply(ts, ty.TimestampType()) == -1
    assert T.YearTransform().apply(ts, ty.TimestampType()) == -1
    d = date_to_days(date(1969, 1, 1))
    assert T.YearTransform().apply(d, ty.DateType()) == -1
    assert T.MonthTransform().apply(d, ty.DateType()) == -12


def test_truncate():
    # transforms_test.go:177-180 + ref truncate semantics
    assert T.TruncateTransform(100).apply(123456789, ty.LongType()) == 123456700
    assert T.TruncateTransform(10).apply(-1, ty.IntegerType()) == -10
    assert T.TruncateTransform(3).apply("iceberg", ty.StringType()) == "ice"
    assert T.TruncateTransform(3).apply(b"icebe", ty.BinaryType()) == b"ice"
    assert T.TruncateTransform(50).apply(
        Decimal("10.65"), ty.DecimalType(9, 2)
    ) == Decimal("10.50")


def test_identity_and_void():
    assert T.IdentityTransform().apply("foobar", ty.StringType()) == "foobar"
    assert T.VoidTransform().apply("x", ty.StringType()) is None
    assert T.BucketTransform(16).apply(None, ty.LongType()) is None


def test_parse_transform():
    # transforms_test.go:52-83
    assert T.parse_transform("bucket[5]") == T.BucketTransform(5)
    assert T.parse_transform("BUCKET[5]") == T.BucketTransform(5)
    assert T.parse_transform("truncate[10]") == T.TruncateTransform(10)
    assert T.parse_transform("identity") == T.IdentityTransform()
    assert T.parse_transform("year") == T.YearTransform()
    for bad in ("bucket", "bucket[]", "bucket[-1]", "unknown"):
        with pytest.raises(ValueError):
            T.parse_transform(bad)


def test_can_transform_matrix():
    # transforms_test.go:244-300
    b = T.BucketTransform(4)
    assert b.can_transform(ty.IntegerType())
    assert b.can_transform(ty.StringType())
    assert b.can_transform(ty.DecimalType(2, 1))
    assert not b.can_transform(ty.BooleanType())
    assert not b.can_transform(ty.FloatType())
    tr = T.TruncateTransform(2)
    assert tr.can_transform(ty.StringType())
    assert not tr.can_transform(ty.DateType())
    y = T.YearTransform()
    assert y.can_transform(ty.DateType())
    assert not y.can_transform(ty.TimeType())
    h = T.HourTransform()
    assert not h.can_transform(ty.DateType())
    assert h.can_transform(ty.TimestampType())


def test_human_str():
    assert T.MonthTransform().to_human_str(13) == "1971-02"
    assert T.DayTransform().to_human_str(405) == "1971-02-10"
    assert T.HourTransform().to_human_str((365 + 40) * 24 + 10) == "1971-02-10-10"
    assert T.YearTransform().to_human_str(1) == "1971"
    assert T.IdentityTransform().to_human_str(None) == "null"


def test_numpy_bucket_matches_scalar():
    import pandas as pd

    from iceberg_go_distributed_spark.iceberg.transforms import _bucket_int64_np

    vals = [0, 1, -1, 34, 123456789012345, -987654321, None]
    s = pd.Series(vals, dtype="Int64")
    out = _bucket_int64_np(s.astype("float").astype("Int64"), 128)
    for v, got in zip(vals, out):
        if v is None:
            assert got is pd.NA or got is None
        else:
            assert got == T.BucketTransform(128).apply(v, ty.LongType()), v


def test_numpy_bytes_bucket_matches_scalar():
    """Batch murmur3 over variable-length byte rows == per-value path,
    incl. the spec vectors, empty string, embedded/trailing nulls, 4-byte
    block boundaries, and a >4096-byte row (scalar fallback branch)."""
    import pandas as pd

    from iceberg_go_distributed_spark.iceberg.transforms import _bucket_bytes_np

    cases = [
        b"",
        b"iceberg",
        b"foobar",
        b"abc",  # tail-only (3 bytes)
        b"abcd",  # exactly one block
        b"abcde",  # block + 1 tail byte
        b"\x00\x01\x02\x03",  # spec binary vector
        b"a\x00\x00",  # trailing nulls must count toward length
        "héllo wörld".encode("utf-8"),
        b"x" * 4095,
        None,
    ]
    out = _bucket_bytes_np(list(cases), 128)
    for v, got in zip(cases, out):
        if v is None:
            assert got is pd.NA or got is None
        else:
            want = (T.murmur3_32(v) & T.MAX_INT32) % 128
            assert got == want, v
    # long-row fallback branch (> _BATCH_MAX_LEN)
    big = [b"y" * 5000, b"iceberg", None]
    out2 = _bucket_bytes_np(big, 128)
    assert out2[0] == (T.murmur3_32(big[0]) & T.MAX_INT32) % 128
    assert out2[1] == (T.murmur3_32(b"iceberg") & T.MAX_INT32) % 128
    assert out2[2] is pd.NA or out2[2] is None


def test_bucket_spark_column_parity(spark):
    """Executor-path (pandas_udf) == scalar bucket_value for every source
    type incl. DateType (which arrives as object datetime.date — the
    int64 fast path would crash or hash micros instead of days)."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [
        (1, 34, "iceberg", date(2017, 11, 16), datetime(2017, 11, 16, 22, 31, 8), Decimal("14.20"), bytearray(b"\x00\x01\x02\x03")),
        (2, -5, "foobar", date(1969, 12, 31), datetime(1969, 12, 31, 23, 0, 0), Decimal("0.01"), bytearray(b"")),
        (3, None, None, None, None, None, None),
        (4, 0, "", date(1970, 1, 1), datetime(1970, 1, 1), Decimal("-3.50"), bytearray(b"a\x00")),
    ]
    df = spark.createDataFrame(
        rows, "id int, i long, s string, d date, ts timestamp_ntz, dec decimal(9,2), b binary"
    )
    n = 64
    b = T.BucketTransform(n)
    specs = [
        ("i", ty.LongType()),
        ("s", ty.StringType()),
        ("d", ty.DateType()),
        ("ts", ty.TimestampType()),
        ("dec", ty.DecimalType(9, 2)),
        ("b", ty.BinaryType()),
    ]
    out = df.select(
        "id", *[b.spark_column(F.col(c), t).alias(f"b_{c}") for c, t in specs]
    ).orderBy("id").collect()
    for row, src_row in zip(out, rows):
        for (c, t), v in zip(specs, src_row[1:]):
            got = row[f"b_{c}"]
            if t.__class__ is ty.TimestampType and v is not None:
                v = datetime_to_micros(v)
            if t.__class__ is ty.BinaryType and v is not None:
                v = bytes(v)
            want = b.apply(v, t)
            assert got == want, (c, v, got, want)
