"""Avro-compatible column-name sanitization + name mapping.

Sanitization ports schema.go:1466-1563 (makeCompatibleName /
sanitizeName): Avro names must match [A-Za-z_][A-Za-z0-9_]*; offending
leading digits become `_<d>`, other offending runes become `_x<HEX>`.
Needed when writing manifests for tables with special-char column names
(exercised by the reference's test_table_sanitized_character fixture).

Name mapping ports name_mapping.go:85: assigns field IDs to files
written without them ('schema.name-mapping.default' property).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Optional

from .types import ListType, MapType, NestedField, Schema, StructType


def valid_avro_name(n: str) -> bool:
    if not n:
        raise ValueError("cannot validate empty name")
    if not (n[0].isalpha() or n[0] == "_"):
        return False
    return all(c.isalnum() or c == "_" for c in n[1:])


def _sanitize_char(c: str) -> str:
    if c.isdigit():
        return "_" + c
    return f"_x{ord(c):X}"


def sanitize_name(n: str) -> str:
    out = []
    first = n[0]
    out.append(first if (first.isalpha() or first == "_") else _sanitize_char(first))
    for c in n[1:]:
        out.append(c if (c.isalnum() or c == "_") else _sanitize_char(c))
    return "".join(out)


def make_compatible_name(n: str) -> str:
    return n if valid_avro_name(n) else sanitize_name(n)


def sanitize_column_names(schema: Schema) -> Schema:
    """ref schema.go:1521 (SanitizeColumnNames) — recursive."""

    def walk_type(t):
        if isinstance(t, StructType):
            return StructType(*[walk_field(f) for f in t.fields])
        if isinstance(t, ListType):
            return ListType(t.element_id, walk_type(t.element), t.element_required)
        if isinstance(t, MapType):
            return MapType(
                t.key_id, walk_type(t.key), t.value_id, walk_type(t.value), t.value_required
            )
        return t

    def walk_field(f: NestedField) -> NestedField:
        from dataclasses import replace

        return replace(
            f, name=make_compatible_name(f.name), field_type=walk_type(f.field_type)
        )

    return Schema(
        schema.schema_id,
        tuple(walk_field(f) for f in schema.fields),
        schema.identifier_field_ids,
    )


# ------------------------------------------------------------- name mapping

@dataclass
class MappedField:
    """One entry of a name mapping — ref name_mapping.go:30-85."""

    names: list[str]
    field_id: Optional[int] = None
    fields: list["MappedField"] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        out: dict = {"names": self.names}
        if self.field_id is not None:
            out["field-id"] = self.field_id
        if self.fields:
            out["fields"] = [f.to_json() for f in self.fields]
        return out

    @staticmethod
    def from_json(obj: dict) -> "MappedField":
        return MappedField(
            names=list(obj.get("names", [])),
            field_id=obj.get("field-id"),
            fields=[MappedField.from_json(f) for f in obj.get("fields", [])],
        )


def name_mapping_from_schema(schema: Schema) -> list[MappedField]:
    """Default mapping: every field maps its current name to its ID."""
    return [MappedField(names=[f.name], field_id=f.field_id) for f in schema.fields]


def name_mapping_to_json(mapping: list[MappedField]) -> str:
    return json.dumps([m.to_json() for m in mapping])


def name_mapping_from_json(s: str) -> list[MappedField]:
    return [MappedField.from_json(o) for o in json.loads(s)]


def apply_name_mapping(mapping: list[MappedField], name: str) -> Optional[int]:
    """Resolve a file column name to a field ID via the mapping."""
    for m in mapping:
        if name in m.names:
            return m.field_id
    return None


def update_name_mapping(
    mapping: list[MappedField], schema: Schema
) -> list[MappedField]:
    """Sync a name mapping with an evolved schema — ref
    name_mapping.go:144 (UpdateNameMapping):

    - a renamed field keeps its OLD names (files written under them
      still resolve) and gains the new one;
    - a name reassigned to a DIFFERENT field id is removed from its old
      entry first (one name must resolve to one id);
    - added fields get fresh entries; dropped fields keep theirs
      (historic files may still carry the column).
    """
    by_id = {m.field_id: m for m in mapping}
    current = {f.field_id: f.name for f in schema.fields}
    out: list[MappedField] = []
    for m in mapping:
        names = [
            n
            for n in m.names
            # drop names now owned by a different live field
            if not any(
                n == cur_name and fid != m.field_id
                for fid, cur_name in current.items()
            )
        ]
        if m.field_id in current and current[m.field_id] not in names:
            names.append(current[m.field_id])
        out.append(MappedField(names=names, field_id=m.field_id, fields=m.fields))
    for f in schema.fields:
        if f.field_id not in by_id:
            out.append(MappedField(names=[f.name], field_id=f.field_id))
    return out
