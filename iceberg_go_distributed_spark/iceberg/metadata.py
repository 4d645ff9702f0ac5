"""Table metadata (format v2): parse/write/mutate with invariants.

Follows the Iceberg spec's table-metadata JSON layout and the
reference's Metadata interface (table/metadata.go:65-154), snapshot
structures (table/snapshots.go), refs (table/refs.go:29-47), and the
MetadataBuilder mutation kernel with its invariants
(table/metadata.go:156-1143): sequence-number and timestamp
monotonicity on AddSnapshot (:435-474), snapshot-id reservation
(:296-339), snapshot-log integrity (:866), metadata-log trim (:959).
"""

from __future__ import annotations

import json
import time
import uuid as _uuid
from dataclasses import dataclass, field, replace
from typing import Any, Optional

from .partitioning import PartitionSpec
from .types import Schema

MAIN_BRANCH = "main"
INITIAL_SEQUENCE_NUMBER = 0
SUPPORTED_FORMAT_VERSION = 2


@dataclass(frozen=True)
class Summary:
    """Snapshot summary: operation + string props — ref snapshots.go:58-87."""

    operation: str  # append | replace | overwrite | delete
    properties: dict[str, str] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"operation": self.operation, **self.properties}

    @staticmethod
    def from_json(obj: dict) -> "Summary":
        props = {k: v for k, v in obj.items() if k != "operation"}
        return Summary(operation=obj.get("operation", "append"), properties=props)


@dataclass(frozen=True)
class Snapshot:
    """ref table/snapshots.go:181-240."""

    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str
    summary: Summary
    parent_snapshot_id: Optional[int] = None
    schema_id: Optional[int] = None
    # v3 row lineage: the first row ID assigned to rows in this snapshot
    # and the number of rows it consumed — ref table/snapshots.go:257-258.
    # Assigned by the v3 commit path (manifest-list writer allocates per
    # data manifest; MetadataBuilder.add_snapshot advances next-row-id).
    first_row_id: Optional[int] = None
    added_rows: Optional[int] = None

    def to_json(self) -> dict:
        out: dict[str, Any] = {
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "manifest-list": self.manifest_list,
            "summary": self.summary.to_json(),
        }
        if self.parent_snapshot_id is not None:
            out["parent-snapshot-id"] = self.parent_snapshot_id
        if self.schema_id is not None:
            out["schema-id"] = self.schema_id
        if self.first_row_id is not None:
            out["first-row-id"] = self.first_row_id
        if self.added_rows is not None:
            out["added-rows"] = self.added_rows
        return out

    @staticmethod
    def from_json(obj: dict) -> "Snapshot":
        return Snapshot(
            snapshot_id=obj["snapshot-id"],
            sequence_number=obj.get("sequence-number", 0),
            timestamp_ms=obj["timestamp-ms"],
            manifest_list=obj["manifest-list"],
            summary=Summary.from_json(obj.get("summary", {})),
            parent_snapshot_id=obj.get("parent-snapshot-id"),
            schema_id=obj.get("schema-id"),
            first_row_id=obj.get("first-row-id"),
            added_rows=obj.get("added-rows"),
        )

    def manifests(self):
        from .manifest import read_manifest_list

        return read_manifest_list(self.manifest_list)


@dataclass(frozen=True)
class SnapshotRef:
    """Branch/tag — ref table/refs.go:29-47."""

    snapshot_id: int
    snapshot_ref_type: str  # "branch" | "tag"
    min_snapshots_to_keep: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    max_ref_age_ms: Optional[int] = None

    def to_json(self) -> dict:
        out: dict[str, Any] = {
            "snapshot-id": self.snapshot_id,
            "type": self.snapshot_ref_type,
        }
        if self.min_snapshots_to_keep is not None:
            out["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            out["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            out["max-ref-age-ms"] = self.max_ref_age_ms
        return out

    @staticmethod
    def from_json(obj: dict) -> "SnapshotRef":
        return SnapshotRef(
            snapshot_id=obj["snapshot-id"],
            snapshot_ref_type=obj["type"],
            min_snapshots_to_keep=obj.get("min-snapshots-to-keep"),
            max_snapshot_age_ms=obj.get("max-snapshot-age-ms"),
            max_ref_age_ms=obj.get("max-ref-age-ms"),
        )


@dataclass(frozen=True)
class SnapshotLogEntry:
    snapshot_id: int
    timestamp_ms: int

    def to_json(self) -> dict:
        return {"snapshot-id": self.snapshot_id, "timestamp-ms": self.timestamp_ms}


@dataclass(frozen=True)
class MetadataLogEntry:
    metadata_file: str
    timestamp_ms: int

    def to_json(self) -> dict:
        return {"metadata-file": self.metadata_file, "timestamp-ms": self.timestamp_ms}


@dataclass(frozen=True)
class SortField:
    """ref table/sorting.go:31-90. Declarative only (no sort executed)."""

    source_id: int
    transform: str = "identity"
    direction: str = "asc"
    null_order: str = "nulls-first"

    def to_json(self) -> dict:
        return {
            "source-id": self.source_id,
            "transform": self.transform,
            "direction": self.direction,
            "null-order": self.null_order,
        }


@dataclass(frozen=True)
class SortOrder:
    """ref table/sorting.go:138-230."""

    order_id: int = 0
    fields: tuple[SortField, ...] = ()

    def to_json(self) -> dict:
        return {"order-id": self.order_id, "fields": [f.to_json() for f in self.fields]}

    @staticmethod
    def from_json(obj: dict) -> "SortOrder":
        return SortOrder(
            order_id=obj.get("order-id", 0),
            fields=tuple(
                SortField(
                    source_id=f["source-id"],
                    transform=f.get("transform", "identity"),
                    direction=f.get("direction", "asc"),
                    null_order=f.get("null-order", "nulls-first"),
                )
                for f in obj.get("fields", ())
            ),
        )


UNSORTED_ORDER = SortOrder(0, ())


@dataclass
class TableMetadata:
    """Immutable-by-convention metadata tree — ref table/metadata.go:65-154."""

    table_uuid: str
    location: str
    last_sequence_number: int = INITIAL_SEQUENCE_NUMBER
    last_updated_ms: int = 0
    last_column_id: int = 0
    schemas: list[Schema] = field(default_factory=list)
    current_schema_id: int = 0
    partition_specs: list[PartitionSpec] = field(default_factory=list)
    default_spec_id: int = 0
    last_partition_id: int = 999
    properties: dict[str, str] = field(default_factory=dict)
    current_snapshot_id: Optional[int] = None
    snapshots: list[Snapshot] = field(default_factory=list)
    snapshot_log: list[SnapshotLogEntry] = field(default_factory=list)
    metadata_log: list[MetadataLogEntry] = field(default_factory=list)
    sort_orders: list[SortOrder] = field(default_factory=lambda: [UNSORTED_ORDER])
    default_sort_order_id: int = 0
    refs: dict[str, SnapshotRef] = field(default_factory=dict)
    format_version: int = SUPPORTED_FORMAT_VERSION
    # Puffin statistics-file entries — parsed and carried, not consumed
    # by the planner (ref table/statistics.go:26-90)
    statistics: list = field(default_factory=list)
    partition_statistics: list = field(default_factory=list)
    # v3 row lineage: the next row ID this table would assign — ref
    # table/metadata.go:1772-1796 (metadataV3.NextRowID). Read-plane
    # only; commits to v3 tables are rejected (see MetadataBuilder).
    next_row_id: Optional[int] = None

    # ------------------------------------------------------------ accessors

    def current_schema(self) -> Schema:
        return self.schema_by_id(self.current_schema_id)

    def schema_by_id(self, schema_id: int) -> Schema:
        for s in self.schemas:
            if s.schema_id == schema_id:
                return s
        raise ValueError(f"schema id {schema_id} not found")

    def spec_by_id(self, spec_id: int) -> PartitionSpec:
        for s in self.partition_specs:
            if s.spec_id == spec_id:
                return s
        raise ValueError(f"partition spec id {spec_id} not found")

    def default_spec(self) -> PartitionSpec:
        return self.spec_by_id(self.default_spec_id)

    def current_snapshot(self) -> Optional[Snapshot]:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def snapshot_by_id(self, snapshot_id: int) -> Optional[Snapshot]:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        return None

    def snapshot_by_ref(self, ref_name: str) -> Optional[Snapshot]:
        r = self.refs.get(ref_name)
        return self.snapshot_by_id(r.snapshot_id) if r else None

    def snapshot_as_of(self, timestamp_ms: int) -> Optional[Snapshot]:
        """Walk the snapshot log — ref table/table.go:235-245 /
        scanner.go:194-210 (same algorithm as Spark's TIMESTAMP AS OF)."""
        best = None
        for entry in self.snapshot_log:
            if entry.timestamp_ms <= timestamp_ms:
                best = entry.snapshot_id
        return self.snapshot_by_id(best) if best is not None else None

    # ---------------------------------------------------------------- json

    def to_json(self) -> dict:
        return {
            "format-version": self.format_version,
            **(
                {"next-row-id": self.next_row_id}
                if self.format_version >= 3 and self.next_row_id is not None
                else {}
            ),
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "last-column-id": self.last_column_id,
            "current-schema-id": self.current_schema_id,
            "schemas": [s.to_json() for s in self.schemas],
            "default-spec-id": self.default_spec_id,
            "partition-specs": [s.to_json() for s in self.partition_specs],
            "last-partition-id": self.last_partition_id,
            "default-sort-order-id": self.default_sort_order_id,
            "sort-orders": [s.to_json() for s in self.sort_orders],
            "properties": self.properties,
            "current-snapshot-id": (
                self.current_snapshot_id if self.current_snapshot_id is not None else -1
            ),
            "refs": {k: v.to_json() for k, v in self.refs.items()},
            "snapshots": [s.to_json() for s in self.snapshots],
            "snapshot-log": [e.to_json() for e in self.snapshot_log],
            "metadata-log": [e.to_json() for e in self.metadata_log],
            **({"statistics": self.statistics} if self.statistics else {}),
            **(
                {"partition-statistics": self.partition_statistics}
                if self.partition_statistics
                else {}
            ),
        }

    @staticmethod
    def from_json(obj: dict) -> "TableMetadata":
        fv = obj.get("format-version")
        if fv not in (1, 2, 3):
            raise ValueError(f"unsupported format version: {fv}")
        if "table-uuid" not in obj:
            raise ValueError("missing table-uuid")
        schemas = [Schema.from_json(s) for s in obj.get("schemas", [])]
        if not schemas and "schema" in obj:  # v1 compat
            schemas = [Schema.from_json(obj["schema"])]
        if not schemas:
            # ref metadata_internal_test.go:1267-1271, 1279-1282
            raise ValueError(
                "invalid metadata: no valid schema configuration found in "
                "table metadata"
            )
        current_schema_id = obj.get("current-schema-id")
        if current_schema_id is None:
            # current-schema-id was optional in v1 ONLY via the legacy
            # `schema` field (ref metadata.go:1689-1695); it never
            # defaults to the first listed schema
            if fv == 1 and "schema" in obj:
                current_schema_id = obj["schema"].get("schema-id", 0)
                # ref metadata.go:1690-1697 (metadataV1.UnmarshalJSON):
                # when the id comes from the legacy `schema` field and no
                # listed schema carries it, the legacy schema is APPENDED
                # to the schema list and the parse succeeds
                if not any(s.schema_id == current_schema_id for s in schemas):
                    schemas = schemas + [Schema.from_json(obj["schema"])]
            else:
                raise ValueError(
                    "invalid metadata: no valid schema configuration "
                    "found in table metadata"
                )
        if not any(s.schema_id == current_schema_id for s in schemas):
            raise ValueError(
                f"invalid metadata: current-schema-id {current_schema_id} "
                "can't be found in any schema"
            )
        specs = [PartitionSpec.from_json(s) for s in obj.get("partition-specs", [])]
        if not specs:
            if fv == 1:
                if "partition-spec" not in obj:
                    raise ValueError("v1 metadata missing partition-spec")
                # v1 legacy field: a bare partition-field list (spec id 0)
                from .partitioning import PartitionField

                legacy = obj["partition-spec"]
                specs = [
                    PartitionSpec(
                        0, tuple(PartitionField.from_json(f) for f in legacy)
                    )
                ]
            else:
                # ref metadata_internal_test.go:1231-1235: v2+ REQUIRES
                # partition-specs — never silently assume unpartitioned
                raise ValueError("invalid metadata: missing partition-specs")
        default_spec_id = obj.get("default-spec-id")
        if default_spec_id is None:
            if fv >= 2:
                # ref metadata.go:1494-1496 (validate): the max-spec-id
                # fallback is a v1-only preValidate rule; v2+ REQUIRES
                # the field
                raise ValueError(
                    "invalid metadata: default-partition-spec-id must be "
                    "set for FormatVersion > 1"
                )
            # v1 compat when default-spec-id is absent: the MAX spec id
            # wins (ref metadata_internal_test.go:1215-1229), not the
            # first listed
            default_spec_id = max(s.spec_id for s in specs)
        if not any(s.spec_id == default_spec_id for s in specs):
            raise ValueError(f"default-spec-id {default_spec_id} not found")
        if fv >= 2 and "last-partition-id" not in obj:
            # ref metadata_internal_test.go:1237-1241
            raise ValueError(
                "invalid metadata: last-partition-id must be set for "
                "FormatVersion > 1"
            )
        orders = [SortOrder.from_json(s) for s in obj.get("sort-orders", [])]
        if not orders:
            if fv >= 2:
                # ref metadata_internal_test.go:1717-1721: v2+ REQUIRES
                # sort-orders (even if just the unsorted order)
                raise ValueError("invalid metadata: missing sort-orders")
            orders = [UNSORTED_ORDER]
        default_sort = obj.get("default-sort-order-id")
        if default_sort is None:
            if fv >= 2:
                # ref metadata.go:1492-1493 (validate): v2+ REQUIRES
                # default-sort-order-id; first-order is a v1-only fallback
                raise ValueError(
                    "invalid metadata: default-sort-order-id must be set "
                    "for FormatVersion > 1"
                )
            default_sort = orders[0].order_id
        if not any(o.order_id == default_sort for o in orders):
            raise ValueError(f"default-sort-order-id {default_sort} not found")
        cur_snap = obj.get("current-snapshot-id")
        if cur_snap in (-1, None):
            cur_snap = None
        snapshots = [Snapshot.from_json(s) for s in obj.get("snapshots", [])]
        if cur_snap is not None and not any(s.snapshot_id == cur_snap for s in snapshots):
            raise ValueError(f"current-snapshot-id {cur_snap} not found")
        refs = {k: SnapshotRef.from_json(v) for k, v in obj.get("refs", {}).items()}
        if cur_snap is not None and MAIN_BRANCH not in refs:
            refs[MAIN_BRANCH] = SnapshotRef(cur_snap, "branch")
        return TableMetadata(
            table_uuid=obj["table-uuid"],
            location=obj["location"],
            last_sequence_number=obj.get("last-sequence-number", 0),
            last_updated_ms=obj.get("last-updated-ms", 0),
            last_column_id=obj.get("last-column-id", 0),
            schemas=schemas,
            current_schema_id=current_schema_id,
            partition_specs=specs,
            default_spec_id=default_spec_id,
            last_partition_id=obj.get(
                "last-partition-id", max((f.field_id for s in specs for f in s.fields), default=999)
            ),
            properties={str(k): str(v) for k, v in obj.get("properties", {}).items()},
            current_snapshot_id=cur_snap,
            snapshots=snapshots,
            snapshot_log=[
                SnapshotLogEntry(e["snapshot-id"], e["timestamp-ms"])
                for e in obj.get("snapshot-log", [])
            ],
            metadata_log=[
                MetadataLogEntry(e["metadata-file"], e["timestamp-ms"])
                for e in obj.get("metadata-log", [])
            ],
            sort_orders=orders,
            default_sort_order_id=default_sort,
            refs=refs,
            # v1 is upgraded to the v2 shape we write; v3 stays v3 so the
            # builder can reject write paths that would break row lineage
            format_version=3 if fv == 3 else 2,
            statistics=obj.get("statistics", []),
            partition_statistics=obj.get("partition-statistics", []),
            next_row_id=obj.get("next-row-id"),
        )


def parse_metadata_file(path: str) -> TableMetadata:
    """ref table/metadata.go:1159-1196 (ParseMetadata), incl. gzip
    support (table/table.go:450 isGzippedMetadataJson)."""
    import gzip

    from . import fileio

    with fileio.open_input(path) as f:
        head = f.read(2)
        f.seek(0)
        data = gzip.open(f).read() if head == b"\x1f\x8b" else f.read()
    return TableMetadata.from_json(json.loads(data))


def new_table_metadata(
    schema: Schema,
    spec: PartitionSpec,
    location: str,
    properties: Optional[dict[str, str]] = None,
    sort_order: SortOrder = UNSORTED_ORDER,
) -> TableMetadata:
    now = int(time.time() * 1000)
    return TableMetadata(
        table_uuid=str(_uuid.uuid4()),
        location=location,
        last_updated_ms=now,
        last_column_id=schema.highest_field_id(),
        schemas=[schema],
        current_schema_id=schema.schema_id,
        partition_specs=[spec],
        default_spec_id=spec.spec_id,
        last_partition_id=spec.last_assigned_field_id(),
        properties=dict(properties or {}),
        sort_orders=[sort_order],
        default_sort_order_id=sort_order.order_id,
    )


# ------------------------------------------------------------------ builder

class CommitStateError(Exception):
    """An invariant of the metadata builder was violated."""


class MetadataBuilder:
    """Mutation kernel — ref table/metadata.go:156-1143. Collects changes
    against a base metadata and produces a new TableMetadata; raises
    CommitStateError when an invariant would be broken."""

    def __init__(self, base: TableMetadata):
        self.base = base
        self.m = replace(
            base,
            schemas=list(base.schemas),
            partition_specs=list(base.partition_specs),
            snapshots=list(base.snapshots),
            snapshot_log=list(base.snapshot_log),
            metadata_log=list(base.metadata_log),
            sort_orders=list(base.sort_orders),
            properties=dict(base.properties),
            refs=dict(base.refs),
            statistics=list(base.statistics),
            partition_statistics=list(base.partition_statistics),
        )
        self._reserved_ids: set[int] = set()
        self.trimmed_metadata_files: list[str] = []

    # ---------------------------------------------------------- snapshots

    def reserve_snapshot_id(self) -> int:
        """Collision-checked id minting — ref table/metadata.go:296-339."""
        import random

        while True:
            sid = random.getrandbits(62) + 1
            if sid not in self._reserved_ids and self.m.snapshot_by_id(sid) is None:
                self._reserved_ids.add(sid)
                return sid

    def next_sequence_number(self) -> int:
        return self.m.last_sequence_number + 1

    def add_snapshot(self, snapshot: Snapshot) -> "MetadataBuilder":
        """Invariants — ref table/metadata.go:435-474."""
        if self.m.format_version >= 3:
            # v3 row lineage (spec v3; ref metadata.go:1789-1856,
            # snapshots.go:257): every snapshot carries first-row-id +
            # added-rows, and table next-row-id advances past the ids the
            # snapshot consumed. A lineage-less snapshot on a v3 table
            # would corrupt row ids for every other reader — refuse.
            if snapshot.first_row_id is None or snapshot.added_rows is None:
                raise CommitStateError(
                    "v3 snapshots must carry first-row-id and added-rows "
                    "(row lineage); commit through the v3-aware write path"
                )
            next_id = self.m.next_row_id or 0
            if snapshot.first_row_id < next_id:
                raise CommitStateError(
                    f"snapshot first-row-id {snapshot.first_row_id} overlaps "
                    f"already-assigned ids (next-row-id {next_id})"
                )
            if snapshot.added_rows < 0:
                raise CommitStateError("snapshot added-rows must be >= 0")
            self.m.next_row_id = snapshot.first_row_id + snapshot.added_rows
        if not self.m.schemas:
            raise CommitStateError("cannot add snapshot before adding a schema")
        if not self.m.partition_specs:
            raise CommitStateError("cannot add snapshot before adding a partition spec")
        if self.m.snapshot_by_id(snapshot.snapshot_id) is not None:
            raise CommitStateError(f"snapshot id {snapshot.snapshot_id} already exists")
        if (
            self.m.format_version >= 2
            and snapshot.sequence_number <= self.m.last_sequence_number
            and snapshot.parent_snapshot_id is not None
        ):
            raise CommitStateError(
                f"sequence number {snapshot.sequence_number} must be greater than "
                f"last sequence number {self.m.last_sequence_number}"
            )
        if self.m.last_updated_ms and snapshot.timestamp_ms < self.m.last_updated_ms - 60_000:
            raise CommitStateError(
                f"snapshot timestamp {snapshot.timestamp_ms} is older than table "
                f"last-updated {self.m.last_updated_ms}"
            )
        self.m.snapshots.append(snapshot)
        self.m.last_sequence_number = max(
            self.m.last_sequence_number, snapshot.sequence_number
        )
        self.m.last_updated_ms = max(self.m.last_updated_ms, snapshot.timestamp_ms)
        return self

    def set_snapshot_ref(
        self,
        ref_name: str,
        snapshot_id: int,
        ref_type: str = "branch",
        **retention,
    ) -> "MetadataBuilder":
        """ref table/metadata.go:687-803. Retention settings on an
        existing ref are preserved unless explicitly overridden —
        a plain branch advance must not wipe retention policy."""
        if self.m.snapshot_by_id(snapshot_id) is None:
            raise CommitStateError(f"cannot set {ref_name}: unknown snapshot {snapshot_id}")
        prev = self.m.refs.get(ref_name)
        if prev is not None and prev.snapshot_ref_type == ref_type and not retention:
            retention = {
                "min_snapshots_to_keep": prev.min_snapshots_to_keep,
                "max_snapshot_age_ms": prev.max_snapshot_age_ms,
                "max_ref_age_ms": prev.max_ref_age_ms,
            }
        self.m.refs[ref_name] = SnapshotRef(snapshot_id, ref_type, **retention)
        if ref_name == MAIN_BRANCH:
            snap = self.m.snapshot_by_id(snapshot_id)
            self.m.current_snapshot_id = snapshot_id
            self.m.last_updated_ms = max(self.m.last_updated_ms, snap.timestamp_ms)
            self.m.snapshot_log.append(
                SnapshotLogEntry(snapshot_id, self.m.last_updated_ms)
            )
        return self

    def remove_snapshot_ref(self, ref_name: str) -> "MetadataBuilder":
        if ref_name == MAIN_BRANCH:
            self.m.current_snapshot_id = None
        self.m.refs.pop(ref_name, None)
        return self

    def remove_snapshots(self, snapshot_ids: list[int]) -> "MetadataBuilder":
        drop = set(snapshot_ids)
        still_referenced = {r.snapshot_id for r in self.m.refs.values()}
        bad = drop & still_referenced
        if bad:
            raise CommitStateError(f"cannot remove snapshots still referenced: {sorted(bad)}")
        self.m.snapshots = [s for s in self.m.snapshots if s.snapshot_id not in drop]
        self.m.snapshot_log = [
            e for e in self.m.snapshot_log if e.snapshot_id not in drop
        ]
        # statistics entries of expired snapshots go with them (Java/Go
        # engines do the same; dangling snapshot-ids are invalid state)
        self.m.statistics = [
            st for st in self.m.statistics if st.get("snapshot-id") not in drop
        ]
        self.m.partition_statistics = [
            st for st in self.m.partition_statistics if st.get("snapshot-id") not in drop
        ]
        return self

    # ------------------------------------------------------ schema / spec

    def add_schema(self, schema: Schema) -> "MetadataBuilder":
        # v3-only types (ns-timestamps) cannot enter a v1/v2 table —
        # ref table/metadata_schema_comptability.go:73-130
        from .types import min_format_version_for_type

        for f in schema.fields:
            need = min_format_version_for_type(f.field_type)
            if need > self.m.format_version:
                raise CommitStateError(
                    f"column {f.name!r} ({f.field_type.name}) requires format "
                    f"version {need}, table is v{self.m.format_version}"
                )
            # field default values are v3+ — ref
            # metadata_schema_comptability.go:99-106
            if f.initial_default is not None and self.m.format_version < 3:
                raise CommitStateError(
                    f"column {f.name!r} has initial-default "
                    f"{f.initial_default!r}; defaults require format version 3, "
                    f"table is v{self.m.format_version}"
                )
        if any(s.schema_id == schema.schema_id for s in self.m.schemas):
            self.m.schemas = [
                schema if s.schema_id == schema.schema_id else s for s in self.m.schemas
            ]
        else:
            self.m.schemas.append(schema)
        self.m.last_column_id = max(self.m.last_column_id, schema.highest_field_id())
        return self

    def set_current_schema(self, schema_id: int) -> "MetadataBuilder":
        if not any(s.schema_id == schema_id for s in self.m.schemas):
            raise CommitStateError(f"cannot set current schema to unknown id {schema_id}")
        self.m.current_schema_id = schema_id
        return self

    def add_partition_spec(self, spec: PartitionSpec) -> "MetadataBuilder":
        if any(s.spec_id == spec.spec_id for s in self.m.partition_specs):
            raise CommitStateError(f"partition spec id {spec.spec_id} already exists")
        self.m.partition_specs.append(spec)
        self.m.last_partition_id = max(
            self.m.last_partition_id, spec.last_assigned_field_id()
        )
        return self

    def set_default_spec(self, spec_id: int) -> "MetadataBuilder":
        if not any(s.spec_id == spec_id for s in self.m.partition_specs):
            raise CommitStateError(f"cannot set default spec to unknown id {spec_id}")
        self.m.default_spec_id = spec_id
        return self

    def add_sort_order(self, order: SortOrder) -> "MetadataBuilder":
        if any(o.order_id == order.order_id for o in self.m.sort_orders):
            raise CommitStateError(f"sort order id {order.order_id} already exists")
        self.m.sort_orders.append(order)
        return self

    def set_default_sort_order(self, order_id: int) -> "MetadataBuilder":
        if not any(o.order_id == order_id for o in self.m.sort_orders):
            raise CommitStateError(f"unknown sort order id {order_id}")
        self.m.default_sort_order_id = order_id
        return self

    # ------------------------------------------------------------- props

    def set_properties(self, props: dict[str, str]) -> "MetadataBuilder":
        self.m.properties.update({str(k): str(v) for k, v in props.items()})
        return self

    def remove_properties(self, keys: list[str]) -> "MetadataBuilder":
        for k in keys:
            self.m.properties.pop(k, None)
        return self

    def set_location(self, location: str) -> "MetadataBuilder":
        self.m.location = location
        return self

    def set_statistics(self, stats: dict) -> "MetadataBuilder":
        """Upsert a statistics-file entry keyed by snapshot-id —
        ref table/statistics.go + updates.go SetStatistics."""
        sid = stats.get("snapshot-id")
        self.m.statistics = [
            s for s in self.m.statistics if s.get("snapshot-id") != sid
        ] + [stats]
        return self

    def remove_statistics(self, snapshot_id: int) -> "MetadataBuilder":
        self.m.statistics = [
            s for s in self.m.statistics if s.get("snapshot-id") != snapshot_id
        ]
        return self

    def set_partition_statistics(self, stats: dict) -> "MetadataBuilder":
        """Upsert a partition-statistics-file entry keyed by snapshot-id
        — ref table/statistics.go:79-87 (PartitionStatisticsFile)."""
        sid = stats.get("snapshot-id")
        self.m.partition_statistics = [
            s for s in self.m.partition_statistics if s.get("snapshot-id") != sid
        ] + [stats]
        return self

    def remove_partition_statistics(self, snapshot_id: int) -> "MetadataBuilder":
        self.m.partition_statistics = [
            s
            for s in self.m.partition_statistics
            if s.get("snapshot-id") != snapshot_id
        ]
        return self

    def assign_uuid(self, u: str) -> "MetadataBuilder":
        if self.m.table_uuid != u:
            self.m = replace(self.m, table_uuid=u)
        return self

    # -------------------------------------------------------------- build

    def append_metadata_log(self, metadata_file: str) -> "MetadataBuilder":
        """Trimmed per write.metadata.previous-versions-max —
        ref table/metadata.go:959, table/properties.go:70-77."""
        self.m.metadata_log.append(
            MetadataLogEntry(metadata_file, int(time.time() * 1000))
        )
        keep = max(
            0,
            int(self.m.properties.get("write.metadata.previous-versions-max", "100")),
        )
        if len(self.m.metadata_log) > keep:
            # NB: log[-0:] would be the whole list — handle keep == 0 explicitly
            trimmed = self.m.metadata_log[:-keep] if keep else self.m.metadata_log
            self.trimmed_metadata_files.extend(e.metadata_file for e in trimmed)
            self.m.metadata_log = self.m.metadata_log[-keep:] if keep else []
        return self

    def build(self) -> TableMetadata:
        if self.m.last_updated_ms == 0:
            self.m.last_updated_ms = int(time.time() * 1000)
        return self.m
