"""Single-value binary serialization (manifest bound values) + helpers.

Implements the Iceberg spec's "Binary single-value serialization" table,
matching the reference's literals.go:127-215 (LiteralFromBytes) and the
per-type MarshalBinary methods: little-endian fixed-width numerics,
UTF-8 strings, big-endian minimal two's-complement decimal unscaled
values, RFC-order UUID bytes.
"""

from __future__ import annotations

import struct
import uuid as _uuid
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Any, Optional

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
    LongType,
    StringType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

EPOCH_DATE = date(1970, 1, 1)
EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)


def decimal_to_unscaled(v: Decimal, scale: int) -> int:
    """Exact unscaled integer of a Decimal at the given scale."""
    sign, digits, exp = v.as_tuple()
    unscaled = int(v.scaleb(scale).to_integral_exact())
    return unscaled


def decimal_to_bytes(v: Decimal, scale: int) -> bytes:
    """Minimal big-endian two's complement of the unscaled value —
    ref literals.go DecimalLiteral.MarshalBinary."""
    unscaled = decimal_to_unscaled(v, scale)
    length = max(1, (unscaled.bit_length() + 8) // 8)  # +1 sign bit, round up
    return unscaled.to_bytes(length, "big", signed=True)


def bytes_to_decimal(b: bytes, scale: int) -> Decimal:
    unscaled = int.from_bytes(b, "big", signed=True)
    return Decimal(unscaled).scaleb(-scale)


def date_to_days(v: date) -> int:
    return (v - EPOCH_DATE).days


def days_to_date(days: int) -> date:
    return date.fromordinal(EPOCH_DATE.toordinal() + days)


def datetime_to_micros(v: datetime) -> int:
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return round((v - EPOCH_DT).total_seconds() * 1_000_000)


def micros_to_datetime(us: int, tz: bool = False) -> datetime:
    dt = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)
    return dt if tz else dt.replace(tzinfo=None)


def _canonicalize(t: IcebergType, v: Any) -> Any:
    """Convert rich Python values to Iceberg's internal representation
    (date → epoch days, datetime → epoch µs, str uuid → UUID)."""
    if v is None:
        return None
    if isinstance(t, DateType) and isinstance(v, date) and not isinstance(v, datetime):
        return date_to_days(v)
    if isinstance(t, (TimestampType, TimestampTzType)) and isinstance(v, datetime):
        return datetime_to_micros(v)
    if isinstance(t, UUIDType) and isinstance(v, str):
        return _uuid.UUID(v)
    if isinstance(t, DecimalType) and not isinstance(v, Decimal):
        return Decimal(str(v))
    return v


def to_bytes(t: IcebergType, v: Any) -> bytes:
    """Serialize one value for a manifest bound."""
    v = _canonicalize(t, v)
    if isinstance(t, BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(t, IntegerType):
        return struct.pack("<i", v)
    if isinstance(t, (LongType, TimeType, TimestampType, TimestampTzType)):
        return struct.pack("<q", int(v))
    if isinstance(t, DateType):
        return struct.pack("<i", int(v))
    if isinstance(t, FloatType):
        return struct.pack("<f", v)
    if isinstance(t, DoubleType):
        return struct.pack("<d", v)
    if isinstance(t, StringType):
        return str(v).encode("utf-8")
    if isinstance(t, UUIDType):
        return v.bytes if isinstance(v, _uuid.UUID) else bytes(v)
    if isinstance(t, (BinaryType, FixedType)):
        return bytes(v)
    if isinstance(t, DecimalType):
        return decimal_to_bytes(v, t.scale)
    raise TypeError(f"cannot serialize {t}")


def from_bytes(t: IcebergType, b: Optional[bytes]) -> Any:
    """Deserialize one manifest bound value."""
    if b is None:
        return None
    if isinstance(t, BooleanType):
        return b != b"\x00"
    if isinstance(t, IntegerType) or isinstance(t, DateType):
        return struct.unpack("<i", b)[0]
    if isinstance(t, (LongType, TimeType, TimestampType, TimestampTzType)):
        if len(b) == 4:
            # bounds written before an int→long promotion stay 4-byte in
            # old manifests (spec: single-value serialization is fixed at
            # write time); decode by width so promoted scans still prune
            return struct.unpack("<i", b)[0]
        return struct.unpack("<q", b)[0]
    if isinstance(t, FloatType):
        return struct.unpack("<f", b)[0]
    if isinstance(t, DoubleType):
        if len(b) == 4:  # float→double promotion, same rule
            return struct.unpack("<f", b)[0]
        return struct.unpack("<d", b)[0]
    if isinstance(t, StringType):
        return b.decode("utf-8")
    if isinstance(t, UUIDType):
        return _uuid.UUID(bytes=bytes(b))
    if isinstance(t, (BinaryType, FixedType)):
        return bytes(b)
    if isinstance(t, DecimalType):
        return bytes_to_decimal(b, t.scale)
    raise TypeError(f"cannot deserialize {t}")
