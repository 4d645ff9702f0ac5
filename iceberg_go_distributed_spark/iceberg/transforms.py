"""Partition transforms — ref transforms.go:40-919.

The one bit-exactness hazard is bucket[N]: Iceberg pins it to
murmur3_x86_32 over a fixed byte layout (ints/dates/times/timestamps as
8-byte little-endian int64, strings as UTF-8, decimals as minimal
big-endian unscaled — ref transforms.go:228-340). Spark's built-in
``hash()`` is murmur3 with a different seed/layout, so `murmur3_32`
below is a pure-Python reimplementation validated against the Iceberg
spec's published hash values and the reference's golden tests
(transforms_test.go:188: bucket[128]("foobar") == 61).

Executor-side (write fanout / residual evaluation) each transform also
compiles to a Spark Column via `spark_column`; bucket uses a vectorized
pandas_udf (numpy for the int64 fast path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date
from decimal import Decimal
from typing import Any, Callable, Optional

from .conversions import (
    date_to_days,
    days_to_date,
    decimal_to_bytes,
    micros_to_datetime,
)
from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

MAX_INT32 = (1 << 31) - 1
_U32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32, returned as unsigned 32-bit int."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * c2) & _U32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _U32
        h = (h * 5 + 0xE6546B64) & _U32
    tail = data[nblocks * 4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * c2) & _U32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _U32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _U32
    h ^= h >> 16
    return h


def _bucket_bytes(b: bytes, n: int) -> int:
    return (murmur3_32(b) & MAX_INT32) % n


def bucket_value(v: Any, src: IcebergType, n: int) -> Optional[int]:
    """Bit-exact bucket of one value — ref transforms.go:249-283."""
    if v is None:
        return None
    if isinstance(src, (IntegerType, LongType, DateType, TimeType, TimestampType, TimestampTzType)):
        if isinstance(v, date):
            v = date_to_days(v)
        iv = int(v) & 0xFFFFFFFFFFFFFFFF  # two's complement into uint64
        return _bucket_bytes(iv.to_bytes(8, "little"), n)
    if isinstance(src, StringType):
        return _bucket_bytes(str(v).encode("utf-8"), n)
    if isinstance(src, (BinaryType, FixedType)):
        return _bucket_bytes(bytes(v), n)
    if isinstance(src, UUIDType):
        import uuid as _uuid

        u = v if isinstance(v, _uuid.UUID) else _uuid.UUID(str(v))
        return _bucket_bytes(u.bytes, n)
    if isinstance(src, DecimalType):
        d = v if isinstance(v, Decimal) else Decimal(str(v))
        return _bucket_bytes(decimal_to_bytes(d, src.scale), n)
    raise TypeError(f"bucket cannot transform {src}")


def _floordiv(v: int, d: int) -> int:
    return v // d  # Python // is already floor division


def _epoch_micros_parts(us: int) -> tuple[int, int]:
    """(year, month) of a µs timestamp, floor semantics for negatives."""
    days = _floordiv(us, 86_400_000_000)
    d = days_to_date(days)
    return d.year, d.month


class Transform:
    """Base transform — parse/format per ref transforms.go:40-83."""

    def can_transform(self, src: IcebergType) -> bool:
        raise NotImplementedError

    def result_type(self, src: IcebergType) -> IcebergType:
        raise NotImplementedError

    def apply(self, v: Any, src: IcebergType) -> Any:
        raise NotImplementedError

    def preserves_order(self) -> bool:
        return False

    def to_human_str(self, v: Any) -> str:
        return "null" if v is None else str(v)

    def spark_column(self, col, src: IcebergType):
        """Executor-side Spark Column computing this transform."""
        raise NotImplementedError

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        return hash(str(self))

    def __repr__(self) -> str:
        return str(self)


_DATETIME_TYPES = (DateType, TimestampType, TimestampTzType)


class IdentityTransform(Transform):
    def __str__(self) -> str:
        return "identity"

    def can_transform(self, src: IcebergType) -> bool:
        return src.is_primitive()

    def result_type(self, src: IcebergType) -> IcebergType:
        return src

    def apply(self, v: Any, src: IcebergType) -> Any:
        return v

    def preserves_order(self) -> bool:
        return True

    def to_human_str(self, v: Any) -> str:
        # identity renders dates/timestamps in ISO form (ref transforms.go:126-143)
        if v is None:
            return "null"
        return str(v)

    def spark_column(self, col, src: IcebergType):
        return col


class VoidTransform(Transform):
    def __str__(self) -> str:
        return "void"

    def can_transform(self, src: IcebergType) -> bool:
        return True

    def result_type(self, src: IcebergType) -> IcebergType:
        return src

    def apply(self, v: Any, src: IcebergType) -> Any:
        return None

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        return F.lit(None)


@dataclass(frozen=True, eq=False)
class BucketTransform(Transform):
    num_buckets: int

    def __str__(self) -> str:
        return f"bucket[{self.num_buckets}]"

    def can_transform(self, src: IcebergType) -> bool:
        return isinstance(
            src,
            (
                IntegerType,
                LongType,
                DateType,
                TimeType,
                TimestampType,
                TimestampTzType,
                DecimalType,
                StringType,
                FixedType,
                BinaryType,
                UUIDType,
            ),
        )

    def result_type(self, src: IcebergType) -> IcebergType:
        return IntegerType()

    def apply(self, v: Any, src: IcebergType) -> Any:
        return bucket_value(v, src, self.num_buckets)

    def spark_column(self, col, src: IcebergType):
        """Vectorized pandas_udf; numpy murmur3 for every bucketable type.

        This is the one transform that cannot stay JVM-side (Spark's
        hash() has a different seed/layout); Arrow batching keeps it
        vectorized. Used only in the write fanout, never in scans.

        Dtype notes (what pyspark's Arrow bridge hands the udf):
          - int/long → int64 (nullable → float64 or Int64), timestamps →
            datetime64[ns] — int64 fast path hashes the 8-byte LE layout.
          - DateType → **object Series of datetime.date** (NOT datetime64),
            so it must be converted to epoch days first: the raw int64
            path would either TypeError on .astype or, coerced, hash
            micros instead of days and produce wrong buckets.
          - strings/binary → object Series; hashed via the padded-buffer
            batch murmur3 (per-row work is only the utf-8 encode).
          - decimal/uuid/fixed → object; per-row byte serialization
            (minimal big-endian unscaled / uuid.bytes), batch hash.
        """
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.types import IntegerType as SparkInt

        n = self.num_buckets
        int_like = isinstance(src, (IntegerType, LongType, TimeType, TimestampType, TimestampTzType))

        # NB: no type hints — `from __future__ import annotations` would
        # stringify them and pyspark's hint inference can't resolve the strings.
        if int_like:

            def _bucket_fn(s):
                return _bucket_int64_np(s, n)

        elif isinstance(src, DateType):

            def _bucket_fn(s):
                import numpy as np

                mask = s.isna().to_numpy()
                # datetime.date objects → epoch days (iceberg hashes days,
                # not micros, for date columns — ref transforms.go:249-283)
                days = (
                    pd.to_datetime(s, errors="coerce")
                    .to_numpy(dtype="datetime64[ns]")
                    .astype("datetime64[D]")
                    .astype("int64")
                )
                days[mask] = 0
                return _finish_bucket(_murmur3_int64_batch(days), mask, n)

        else:
            to_bytes = _byte_serializer(src)

            def _bucket_fn(s):
                # object Series can carry NaN (not None) for nulls
                vals = [None if pd.isna(v) else to_bytes(v) for v in s.tolist()]
                return _bucket_bytes_np(vals, n)

        _bucket_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return F.pandas_udf(SparkInt())(_bucket_fn)(col)


def _byte_serializer(src: IcebergType) -> Callable[[Any], bytes]:
    """Per-value byte layout for the batch hasher — ref transforms.go:249-283."""
    if isinstance(src, StringType):
        return lambda v: str(v).encode("utf-8")
    if isinstance(src, (BinaryType, FixedType)):
        return lambda v: bytes(v)
    if isinstance(src, UUIDType):
        import uuid as _uuid

        return lambda v: (v if isinstance(v, _uuid.UUID) else _uuid.UUID(str(v))).bytes
    if isinstance(src, DecimalType):
        scale = src.scale
        return lambda v: decimal_to_bytes(v if isinstance(v, Decimal) else Decimal(str(v)), scale)
    raise TypeError(f"bucket cannot transform {src}")


def _mix_k(k):
    import numpy as np

    k = (k * np.uint32(0xCC9E2D51)).astype("uint32")
    k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype("uint32")
    return (k * np.uint32(0x1B873593)).astype("uint32")


def _avalanche(h):
    import numpy as np

    h = h ^ (h >> np.uint32(16))
    h = (h * np.uint32(0x85EBCA6B)).astype("uint32")
    h = h ^ (h >> np.uint32(13))
    h = (h * np.uint32(0xC2B2AE35)).astype("uint32")
    return h ^ (h >> np.uint32(16))


def _finish_bucket(h, mask, n: int):
    """uint32 hashes → nullable Int32 bucket Series."""
    import numpy as np
    import pandas as pd

    out = ((h & np.uint32(MAX_INT32)) % np.uint32(n)).astype("int32")
    res = pd.Series(out).astype("Int32")
    res[mask] = None
    return res


def _murmur3_int64_batch(vals):
    """murmur3_x86_32 over 8-byte LE int64 values (two fixed blocks)."""
    import numpy as np

    v = vals.astype("uint64")
    lo = (v & np.uint64(0xFFFFFFFF)).astype("uint32")
    hi = (v >> np.uint64(32)).astype("uint32")
    h = np.zeros(len(v), dtype="uint32")
    for blk in (lo, hi):
        h = h ^ _mix_k(blk)
        h = ((h << np.uint32(13)) | (h >> np.uint32(19))).astype("uint32")
        h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype("uint32")
    return _avalanche(h ^ np.uint32(8))


def _bucket_int64_np(s, n: int):
    """numpy-vectorized bucket over an int64-like pandas Series."""
    import numpy as np

    mask = s.isna().to_numpy()
    vals = s.fillna(0).to_numpy()
    if vals.dtype.kind == "M":  # datetime64 → µs
        vals = vals.astype("datetime64[us]").astype("int64")
    return _finish_bucket(_murmur3_int64_batch(vals.astype("int64")), mask, n)


# Rows longer than this fall back to scalar hashing: the padded batch
# buffer is n_rows × max_len bytes, which a single long outlier would blow
# up. Partition keys are short; this guards pathological inputs only.
_BATCH_MAX_LEN = 4096


def _bucket_bytes_np(vals: list, n: int):
    """numpy-vectorized murmur3_x86_32 over variable-length byte rows.

    Rows are scattered into one zero-padded (n_rows × W) uint8 buffer
    (vectorized: one np.repeat/arange scatter), viewed as little-endian
    uint32 words, then hashed with masked block updates: word j is a
    *full* block for rows with len ≥ 4(j+1) (mix + rotate + mult-add), a
    *tail* block for rows with 4j < len < 4(j+1) (mix + xor only — the
    zero padding already gives the spec's tail layout), and a no-op for
    shorter rows. O(max_len/4) vectorized passes instead of per-row
    Python murmur.
    """
    import numpy as np
    import pandas as pd

    n_rows = len(vals)
    if n_rows == 0:
        return pd.Series([], dtype="Int32")
    mask = np.fromiter((v is None for v in vals), dtype=bool, count=n_rows)
    lengths = np.fromiter((0 if v is None else len(v) for v in vals), dtype="int64", count=n_rows)

    long_rows = lengths > _BATCH_MAX_LEN
    if long_rows.any():
        out = pd.Series(
            [None if v is None else _bucket_bytes(v, n) for v in vals], dtype="Int32"
        )
        return out

    max_len = int(lengths.max())
    w4 = max(4, ((max_len + 3) // 4) * 4)
    padded = np.zeros((n_rows, w4), dtype="uint8")
    flat = np.frombuffer(b"".join(v for v in vals if v), dtype="uint8")
    if flat.size:
        row_idx = np.repeat(np.arange(n_rows), lengths)
        col_idx = np.arange(flat.size, dtype="int64") - np.repeat(
            np.cumsum(lengths) - lengths, lengths
        )
        padded[row_idx, col_idx] = flat
    words = padded.view("<u4")

    h = np.zeros(n_rows, dtype="uint32")
    for j in range(words.shape[1]):
        km = _mix_k(words[:, j])
        hx = h ^ km
        hf = ((hx << np.uint32(13)) | (hx >> np.uint32(19))).astype("uint32")
        hf = (hf * np.uint32(5) + np.uint32(0xE6546B64)).astype("uint32")
        full = lengths >= (j + 1) * 4
        tail = (lengths > j * 4) & ~full
        h = np.where(full, hf, np.where(tail, hx, h))
    h = _avalanche(h ^ lengths.astype("uint32"))
    return _finish_bucket(h, mask, n)


@dataclass(frozen=True, eq=False)
class TruncateTransform(Transform):
    width: int

    def __str__(self) -> str:
        return f"truncate[{self.width}]"

    def can_transform(self, src: IcebergType) -> bool:
        return isinstance(src, (IntegerType, LongType, StringType, BinaryType, DecimalType))

    def result_type(self, src: IcebergType) -> IcebergType:
        return src

    def preserves_order(self) -> bool:
        return True

    def apply(self, v: Any, src: IcebergType) -> Any:
        # ref transforms.go:376-555
        if v is None:
            return None
        w = self.width
        if isinstance(src, (IntegerType, LongType)):
            return v - (v % w)  # Python % is floored → matches ((v%W)+W)%W
        if isinstance(src, StringType):
            return str(v)[:w]  # first W codepoints
        if isinstance(src, BinaryType):
            return bytes(v)[:w]
        if isinstance(src, DecimalType):
            d = v if isinstance(v, Decimal) else Decimal(str(v))
            unscaled = int(d.scaleb(src.scale).to_integral_exact())
            return Decimal(unscaled - (unscaled % w)).scaleb(-src.scale)
        raise TypeError(f"truncate cannot transform {src}")

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        if isinstance(src, (IntegerType, LongType)):
            return col - F.pmod(col, F.lit(self.width))
        if isinstance(src, StringType):
            return F.substring(col, 1, self.width)
        if isinstance(src, BinaryType):
            return F.expr(f"substring({col._jc.toString()}, 1, {self.width})")
        raise TypeError(f"no spark column for truncate on {src}")


class _TimeTransform(Transform):
    def can_transform(self, src: IcebergType) -> bool:
        return isinstance(src, _DATETIME_TYPES)

    def result_type(self, src: IcebergType) -> IcebergType:
        return IntegerType()

    def preserves_order(self) -> bool:
        return True

    def _from_days(self, days: int) -> int:
        raise NotImplementedError

    def apply(self, v: Any, src: IcebergType) -> Any:
        if v is None:
            return None
        if isinstance(src, DateType):
            days = date_to_days(v) if isinstance(v, date) else int(v)
            return self._from_days(days)
        us = int(v)
        return self._from_micros(us)

    def _from_micros(self, us: int) -> int:
        return self._from_days(_floordiv(us, 86_400_000_000))


class YearTransform(_TimeTransform):
    def __str__(self) -> str:
        return "year"

    def _from_days(self, days: int) -> int:
        return days_to_date(days).year - 1970  # ref transforms.go:598-669

    def to_human_str(self, v: Any) -> str:
        return "null" if v is None else str(1970 + v)

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        return (F.year(col) - 1970).cast("int")


class MonthTransform(_TimeTransform):
    def __str__(self) -> str:
        return "month"

    def _from_days(self, days: int) -> int:
        d = days_to_date(days)
        return (d.year - 1970) * 12 + d.month - 1

    def to_human_str(self, v: Any) -> str:
        if v is None:
            return "null"
        return f"{1970 + v // 12:04d}-{v % 12 + 1:02d}"

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        return ((F.year(col) - 1970) * 12 + F.month(col) - 1).cast("int")


class DayTransform(_TimeTransform):
    def __str__(self) -> str:
        return "day"

    def result_type(self, src: IcebergType) -> IcebergType:
        return DateType()

    def _from_days(self, days: int) -> int:
        return days

    def to_human_str(self, v: Any) -> str:
        return "null" if v is None else days_to_date(v).isoformat()

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        return F.datediff(F.to_date(col), F.lit("1970-01-01").cast("date")).cast("int")


class HourTransform(_TimeTransform):
    def __str__(self) -> str:
        return "hour"

    def can_transform(self, src: IcebergType) -> bool:
        return isinstance(src, (TimestampType, TimestampTzType))

    def _from_micros(self, us: int) -> int:
        return _floordiv(us, 3_600_000_000)

    def _from_days(self, days: int) -> int:
        return days * 24

    def to_human_str(self, v: Any) -> str:
        if v is None:
            return "null"
        dt = micros_to_datetime(v * 3_600_000_000)
        return dt.strftime("%Y-%m-%d-%H")

    def spark_column(self, col, src: IcebergType):
        from pyspark.sql import functions as F

        return F.floor(F.unix_micros(col.cast("timestamp")) / 3_600_000_000).cast("int")


_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$", re.IGNORECASE)
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$", re.IGNORECASE)
_SIMPLE = {
    "identity": IdentityTransform,
    "void": VoidTransform,
    "year": YearTransform,
    "month": MonthTransform,
    "day": DayTransform,
    "hour": HourTransform,
}


def parse_transform(s: str) -> Transform:
    """Transform registry/parser — ref transforms.go:40-83."""
    low = s.strip().lower()
    if low in _SIMPLE:
        return _SIMPLE[low]()
    if m := _BUCKET_RE.match(low):
        n = int(m.group(1))
        if n < 1:
            raise ValueError(f"bucket count must be positive: {s!r}")
        return BucketTransform(n)
    if m := _TRUNCATE_RE.match(low):
        w = int(m.group(1))
        if w < 1:
            raise ValueError(f"truncate width must be positive: {s!r}")
        return TruncateTransform(w)
    raise ValueError(f"invalid transform: {s!r}")
