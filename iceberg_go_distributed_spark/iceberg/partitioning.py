"""PartitionSpec — ref partitions.go:44-88; path rendering :447-463."""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from .transforms import Transform, parse_transform
from .types import Schema, StructType

PARTITION_DATA_ID_START = 1000  # spec: partition field IDs start at 1000


@dataclass(frozen=True)
class PartitionField:
    """ref partitions.go:44-57."""

    source_id: int
    field_id: int
    name: str
    transform: Transform

    def __str__(self) -> str:
        return f"{self.field_id}: {self.name}: {self.transform}({self.source_id})"

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": str(self.transform),
        }

    @staticmethod
    def from_json(obj: dict) -> "PartitionField":
        return PartitionField(
            source_id=obj["source-id"],
            field_id=obj["field-id"],
            name=obj["name"],
            transform=parse_transform(obj["transform"]),
        )


@dataclass(frozen=True)
class PartitionSpec:
    """ref partitions.go:80-125."""

    spec_id: int = 0
    fields: tuple[PartitionField, ...] = ()

    @staticmethod
    def unpartitioned() -> "PartitionSpec":
        return PartitionSpec(0, ())

    def is_unpartitioned(self) -> bool:
        return not self.fields

    def fields_by_source_id(self, source_id: int) -> list[PartitionField]:
        return [f for f in self.fields if f.source_id == source_id]

    def last_assigned_field_id(self) -> int:
        return max((f.field_id for f in self.fields), default=PARTITION_DATA_ID_START - 1)

    def partition_type(self, schema: Schema) -> StructType:
        from .evaluators import partition_type

        return partition_type(self, schema)

    def compatible_with(self, other: "PartitionSpec") -> bool:
        return [
            (f.source_id, f.name, str(f.transform)) for f in self.fields
        ] == [(f.source_id, f.name, str(f.transform)) for f in other.fields]

    def partition_to_path(self, values: Sequence[Any], schema: Schema) -> str:
        """Hive-style path with URL-quoted human-readable values —
        ref partitions.go:447-463 (PartitionToPath)."""
        segments = []
        for pf, v in zip(self.fields, values):
            vs = pf.transform.to_human_str(v)
            segments.append(
                f"{urllib.parse.quote(pf.name, safe='')}={urllib.parse.quote(vs, safe='')}"
            )
        return "/".join(segments)

    def to_json(self) -> dict:
        return {"spec-id": self.spec_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(obj: dict) -> "PartitionSpec":
        return PartitionSpec(
            spec_id=obj.get("spec-id", 0),
            fields=tuple(PartitionField.from_json(f) for f in obj.get("fields", ())),
        )


def spec_from(
    schema: Schema, *defs: tuple[str, str] | tuple[str, str, str], spec_id: int = 0
) -> PartitionSpec:
    """Convenience builder: spec_from(schema, ("l_shipdate", "day"),
    ("l_suppkey", "bucket[16]", "supp_bucket"))."""
    fields = []
    next_id = PARTITION_DATA_ID_START
    for d in defs:
        col, transform_s = d[0], d[1]
        src = schema.find_field(col)
        if src is None:
            raise ValueError(f"unknown partition source column {col!r}")
        transform = parse_transform(transform_s)
        if not transform.can_transform(src.field_type):
            raise ValueError(f"{transform} cannot transform {src.field_type}")
        name = d[2] if len(d) > 2 else _default_name(col, transform_s)
        fields.append(PartitionField(src.field_id, next_id, name, transform))
        next_id += 1
    return PartitionSpec(spec_id, tuple(fields))


def _default_name(col: str, transform_s: str) -> str:
    """Default partition field names — aligned with the Java client
    (ref partitions.go:462+ GeneratePartitionFieldName)."""
    t = transform_s.lower()
    if t == "identity":
        return col
    if t.startswith("bucket["):
        return f"{col}_bucket"
    if t.startswith("truncate["):
        return f"{col}_trunc"
    if t == "void":
        return f"{col}_null"
    return f"{col}_{t}"
