"""Schema & partition-spec evolution.

UpdateSchema ports table/update_schema.go:89-944 (add/drop/rename/move/
update-column with type-promotion checks, union-by-name) and UpdateSpec
ports table/update_spec.go:35-411 (add/remove/rename partition fields,
redundancy check, new spec id).

Read-side correctness across schema versions relies on field IDs: the
write path stamps `PARQUET:field_id` on every column and `Scan.to_df`
reads with `spark.sql.parquet.fieldId.read.enabled`, so renamed columns
resolve by ID exactly as the reference's ID-based column translation
does (visitors.go TranslateColumnNames / arrow_scanner's file-schema
rebinding)."""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Optional

from .metadata import CommitStateError
from .partitioning import PartitionField, PartitionSpec, _default_name
from .transforms import parse_transform
from .types import IcebergType, NestedField, Schema, promote_type


class UpdateSchema:
    """Accumulates column changes; commit() produces add-schema +
    set-current-schema updates on a transaction."""

    def __init__(self, table):
        self.table = table
        self.base = table.metadata.current_schema()
        self._fields: list[NestedField] = list(self.base.fields)
        self._next_id = table.metadata.last_column_id + 1

    def _find(self, name: str) -> int:
        for i, f in enumerate(self._fields):
            if f.name == name:
                return i
        raise ValueError(f"column {name!r} not found")

    def add_column(
        self,
        name: str,
        field_type: IcebergType,
        doc: Optional[str] = None,
        required: bool = False,
    ) -> "UpdateSchema":
        if any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} already exists")
        if required:
            # ref update_schema.go: new required columns need a default;
            # v2 defaults are not implemented → reject, matching the
            # reference's incompatible-change error
            raise ValueError("cannot add a required column without a default value")
        self._fields.append(NestedField(self._next_id, name, field_type, False, doc))
        self._next_id += 1
        return self

    def drop_column(self, name: str) -> "UpdateSchema":
        if any(f.field_id in self.base.identifier_field_ids and f.name == name for f in self._fields):
            raise ValueError(f"cannot drop identifier field {name!r}")
        self._fields.pop(self._find(name))
        return self

    def rename_column(self, old: str, new: str) -> "UpdateSchema":
        if any(f.name == new for f in self._fields):
            raise ValueError(f"column {new!r} already exists")
        i = self._find(old)
        self._fields[i] = replace(self._fields[i], name=new)
        return self

    def update_column(
        self,
        name: str,
        field_type: Optional[IcebergType] = None,
        required: Optional[bool] = None,
        doc: Optional[str] = None,
    ) -> "UpdateSchema":
        i = self._find(name)
        f = self._fields[i]
        if field_type is not None and field_type != f.field_type:
            promote_type(f.field_type, field_type)  # raises if illegal
            f = replace(f, field_type=field_type)
        if required is not None and required != f.required:
            if required:
                raise ValueError("cannot make an optional column required")
            f = replace(f, required=False)
        if doc is not None:
            f = replace(f, doc=doc)
        self._fields[i] = f
        return self

    def move_first(self, name: str) -> "UpdateSchema":
        f = self._fields.pop(self._find(name))
        self._fields.insert(0, f)
        return self

    def move_before(self, name: str, other: str) -> "UpdateSchema":
        f = self._fields.pop(self._find(name))
        self._fields.insert(self._find(other), f)
        return self

    def move_after(self, name: str, other: str) -> "UpdateSchema":
        f = self._fields.pop(self._find(name))
        self._fields.insert(self._find(other) + 1, f)
        return self

    def union_by_name(self, other: Schema) -> "UpdateSchema":
        """Merge columns from `other` by name: new names are added,
        existing ones promoted if needed — ref update_schema.go UnionByName."""
        for of in other.fields:
            try:
                i = self._find(of.name)
            except ValueError:
                self._fields.append(
                    NestedField(self._next_id, of.name, of.field_type, False, of.doc)
                )
                self._next_id += 1
                continue
            cur = self._fields[i]
            if cur.field_type != of.field_type:
                self.update_column(of.name, field_type=promote_type(cur.field_type, of.field_type))
        return self

    def apply(self) -> Schema:
        if not self._fields:
            raise ValueError("schema must have at least one column")
        new_id = max((s.schema_id for s in self.table.metadata.schemas), default=0) + 1
        return Schema(new_id, tuple(self._fields), self.base.identifier_field_ids)

    def commit(self) -> Schema:
        new_schema = self.apply()
        if tuple(new_schema.fields) == tuple(self.base.fields):
            return self.base
        tx = self.table.transaction()
        tx.add_schema(new_schema, make_current=True)
        # keep the name mapping in sync (ref name_mapping.go:144
        # UpdateNameMapping): renamed fields keep old names AND gain the
        # new one, so ID-less files written under either name resolve
        nm_json = self.table.metadata.properties.get("schema.name-mapping.default")
        if nm_json:
            from .sanitize import (
                name_mapping_from_json,
                name_mapping_to_json,
                update_name_mapping,
            )

            updated = update_name_mapping(name_mapping_from_json(nm_json), new_schema)
            tx.set_properties(
                {"schema.name-mapping.default": name_mapping_to_json(updated)}
            )
        # keep per-column metrics overrides in sync: resolve_metrics_modes
        # rejects keys naming no schema path (typos fail loudly), so a
        # rename must MOVE the property to the new path and a drop must
        # REMOVE it — otherwise the table becomes unwritable after the
        # evolution commit (ref table/properties.go metrics keys)
        from .write import METRICS_COLUMN_PREFIX, _column_paths

        old_paths = _column_paths(self.base)
        new_paths = _column_paths(new_schema)
        fid_to_new = {fid: p for p, fid in new_paths.items()}
        moves, removals = {}, []
        for key, val in self.table.metadata.properties.items():
            if not key.startswith(METRICS_COLUMN_PREFIX):
                continue
            path = key[len(METRICS_COLUMN_PREFIX):]
            if path in new_paths:
                continue
            removals.append(key)
            fid = old_paths.get(path)
            new_path = fid_to_new.get(fid) if fid is not None else None
            if new_path is not None:
                moves[METRICS_COLUMN_PREFIX + new_path] = val
        for key in removals:
            tx.remove_properties(key)
        if moves:
            tx.set_properties(moves)
        tx.commit()
        return new_schema


class UpdateSpec:
    """Partition-spec evolution — ref table/update_spec.go:35-411."""

    def __init__(self, table):
        self.table = table
        self.base = table.metadata.default_spec()
        self.schema = table.metadata.current_schema()
        self._fields: list[PartitionField] = list(self.base.fields)
        self._next_field_id = max(
            table.metadata.last_partition_id,
            self.base.last_assigned_field_id(),
        ) + 1

    def add_field(
        self, source_name: str, transform_s: str, name: Optional[str] = None
    ) -> "UpdateSpec":
        src = self.schema.find_field(source_name)
        if src is None:
            raise ValueError(f"unknown source column {source_name!r}")
        transform = parse_transform(transform_s)
        if not transform.can_transform(src.field_type):
            raise ValueError(f"{transform} cannot transform {src.field_type}")
        for f in self._fields:
            if f.source_id == src.field_id and str(f.transform) == str(transform):
                raise ValueError(
                    f"duplicate partition field: {transform} on {source_name!r}"
                )
        self._fields.append(
            PartitionField(
                src.field_id,
                self._next_field_id,
                name or _default_name(source_name, transform_s),
                transform,
            )
        )
        self._next_field_id += 1
        return self

    def remove_field(self, name: str) -> "UpdateSpec":
        for i, f in enumerate(self._fields):
            if f.name == name:
                self._fields.pop(i)
                return self
        raise ValueError(f"partition field {name!r} not found")

    def rename_field(self, old: str, new: str) -> "UpdateSpec":
        for i, f in enumerate(self._fields):
            if f.name == old:
                self._fields[i] = replace(f, name=new)
                return self
        raise ValueError(f"partition field {old!r} not found")

    def apply(self) -> PartitionSpec:
        new_id = max(s.spec_id for s in self.table.metadata.partition_specs) + 1
        return PartitionSpec(new_id, tuple(self._fields))

    def commit(self) -> PartitionSpec:
        new_spec = self.apply()
        if new_spec.compatible_with(self.base):
            return self.base
        from .transaction import AddPartitionSpecUpdate, AssertTableUUID, SetDefaultSpec

        tx = self.table.transaction()
        tx.apply(
            [AddPartitionSpecUpdate(new_spec), SetDefaultSpec(new_spec.spec_id)],
            [AssertTableUUID(self.table.metadata.table_uuid)],
        )
        tx.commit()
        return new_spec
