"""Transactions: Update/Requirement taxonomy + optimistic commit.

Mirrors table/updates.go:56-557 (17 update kinds), table/requirements.go
:106-320 (8 requirement kinds), table/transaction.go:63-120 (apply) and
:608-635 (Commit → catalog CAS). Updates are JSON-serializable with the
REST-catalog wire names so the taxonomy is wire-compatible.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Optional

from .catalog import CommitConflictError
from .manifest import ManifestFile, write_manifest_list
from .metadata import (
    MAIN_BRANCH,
    CommitStateError,
    MetadataBuilder,
    Snapshot,
    SortOrder,
    Summary,
    TableMetadata,
)
from .partitioning import PartitionSpec
from .types import Schema


# ------------------------------------------------------------------ updates

class Update:
    action: str = ""

    def apply(self, b: MetadataBuilder) -> None:
        raise NotImplementedError

    def to_json(self) -> dict:
        return {"action": self.action}


@dataclass
class AssignUUID(Update):
    uuid: str
    action = "assign-uuid"

    def apply(self, b):
        b.assign_uuid(self.uuid)

    def to_json(self):
        return {"action": self.action, "uuid": self.uuid}


@dataclass
class UpgradeFormatVersion(Update):
    format_version: int
    action = "upgrade-format-version"

    def apply(self, b):
        if self.format_version < b.m.format_version:
            raise CommitStateError("cannot downgrade format version")
        b.m.format_version = self.format_version
        if self.format_version >= 3 and b.m.next_row_id is None:
            # row-id space starts empty on upgrade; pre-upgrade manifests
            # get first_row_id lazily at the next commit's list write
            b.m.next_row_id = 0

    def to_json(self):
        return {"action": self.action, "format-version": self.format_version}


@dataclass
class AddSchemaUpdate(Update):
    schema: Schema
    action = "add-schema"

    def apply(self, b):
        b.add_schema(self.schema)

    def to_json(self):
        return {"action": self.action, "schema": self.schema.to_json()}


@dataclass
class SetCurrentSchema(Update):
    schema_id: int
    action = "set-current-schema"

    def apply(self, b):
        b.set_current_schema(self.schema_id)

    def to_json(self):
        return {"action": self.action, "schema-id": self.schema_id}


@dataclass
class AddPartitionSpecUpdate(Update):
    spec: PartitionSpec
    action = "add-spec"

    def apply(self, b):
        b.add_partition_spec(self.spec)

    def to_json(self):
        return {"action": self.action, "spec": self.spec.to_json()}


@dataclass
class SetDefaultSpec(Update):
    spec_id: int
    action = "set-default-spec"

    def apply(self, b):
        b.set_default_spec(self.spec_id)

    def to_json(self):
        return {"action": self.action, "spec-id": self.spec_id}


@dataclass
class AddSortOrderUpdate(Update):
    sort_order: SortOrder
    action = "add-sort-order"

    def apply(self, b):
        b.add_sort_order(self.sort_order)

    def to_json(self):
        return {"action": self.action, "sort-order": self.sort_order.to_json()}


@dataclass
class SetDefaultSortOrder(Update):
    sort_order_id: int
    action = "set-default-sort-order"

    def apply(self, b):
        b.set_default_sort_order(self.sort_order_id)

    def to_json(self):
        return {"action": self.action, "sort-order-id": self.sort_order_id}


@dataclass
class AddSnapshotUpdate(Update):
    snapshot: Snapshot
    action = "add-snapshot"

    def apply(self, b):
        b.add_snapshot(self.snapshot)

    def to_json(self):
        return {"action": self.action, "snapshot": self.snapshot.to_json()}


@dataclass
class SetSnapshotRef(Update):
    ref_name: str
    snapshot_id: int
    ref_type: str = "branch"
    min_snapshots_to_keep: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    max_ref_age_ms: Optional[int] = None
    action = "set-snapshot-ref"

    def _retention(self) -> dict:
        out = {}
        if self.min_snapshots_to_keep is not None:
            out["min_snapshots_to_keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            out["max_snapshot_age_ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            out["max_ref_age_ms"] = self.max_ref_age_ms
        return out

    def apply(self, b):
        b.set_snapshot_ref(
            self.ref_name, self.snapshot_id, self.ref_type, **self._retention()
        )

    def to_json(self):
        out = {
            "action": self.action,
            "ref-name": self.ref_name,
            "snapshot-id": self.snapshot_id,
            "type": self.ref_type,
        }
        if self.min_snapshots_to_keep is not None:
            out["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            out["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            out["max-ref-age-ms"] = self.max_ref_age_ms
        return out


@dataclass
class RemoveSnapshotRef(Update):
    ref_name: str
    action = "remove-snapshot-ref"

    def apply(self, b):
        b.remove_snapshot_ref(self.ref_name)

    def to_json(self):
        return {"action": self.action, "ref-name": self.ref_name}


@dataclass
class RemoveSnapshots(Update):
    snapshot_ids: list[int]
    action = "remove-snapshots"

    def apply(self, b):
        b.remove_snapshots(self.snapshot_ids)

    def to_json(self):
        return {"action": self.action, "snapshot-ids": self.snapshot_ids}


@dataclass
class SetLocation(Update):
    location: str
    action = "set-location"

    def apply(self, b):
        b.set_location(self.location)

    def to_json(self):
        return {"action": self.action, "location": self.location}


@dataclass
class SetProperties(Update):
    updates: dict[str, str]
    action = "set-properties"

    def apply(self, b):
        b.set_properties(self.updates)

    def to_json(self):
        return {"action": self.action, "updates": self.updates}


@dataclass
class RemoveProperties(Update):
    removals: list[str]
    action = "remove-properties"

    def apply(self, b):
        b.remove_properties(self.removals)

    def to_json(self):
        return {"action": self.action, "removals": self.removals}


# -------------------------------------------------------------- requirements

class Requirement:
    type: str = ""

    def validate(self, md: Optional[TableMetadata]) -> None:
        raise NotImplementedError

    def to_json(self) -> dict:
        return {"type": self.type}


@dataclass
class AssertCreate(Requirement):
    type = "assert-create"

    def validate(self, md):
        if md is not None:
            raise CommitStateError("table already exists")


@dataclass
class AssertTableUUID(Requirement):
    uuid: str
    type = "assert-table-uuid"

    def validate(self, md):
        if md is None or md.table_uuid != self.uuid:
            raise CommitStateError(
                f"table UUID mismatch: expected {self.uuid}, "
                f"found {md.table_uuid if md else None}"
            )

    def to_json(self):
        return {"type": self.type, "uuid": self.uuid}


@dataclass
class AssertRefSnapshotID(Requirement):
    """The distributed-snapshot conflict guard —
    ref table/transaction.go:157-225 + requirements.go."""

    ref: str
    snapshot_id: Optional[int]
    type = "assert-ref-snapshot-id"

    def validate(self, md):
        if md is None:
            raise CommitStateError("table does not exist")
        r = md.refs.get(self.ref)
        actual = r.snapshot_id if r else None
        if actual != self.snapshot_id:
            raise CommitConflictError(
                f"ref {self.ref!r} moved: expected {self.snapshot_id}, found {actual}"
            )

    def to_json(self):
        return {"type": self.type, "ref": self.ref, "snapshot-id": self.snapshot_id}


@dataclass
class AssertCurrentSchemaID(Requirement):
    schema_id: int
    type = "assert-current-schema-id"

    def validate(self, md):
        if md is None or md.current_schema_id != self.schema_id:
            raise CommitStateError("current schema id changed")

    def to_json(self):
        return {"type": self.type, "current-schema-id": self.schema_id}


@dataclass
class AssertDefaultSpecID(Requirement):
    spec_id: int
    type = "assert-default-spec-id"

    def validate(self, md):
        if md is None or md.default_spec_id != self.spec_id:
            raise CommitStateError("default spec id changed")

    def to_json(self):
        return {"type": self.type, "default-spec-id": self.spec_id}


@dataclass
class AssertDefaultSortOrderID(Requirement):
    sort_order_id: int
    type = "assert-default-sort-order-id"

    def validate(self, md):
        if md is None or md.default_sort_order_id != self.sort_order_id:
            raise CommitStateError("default sort order id changed")

    def to_json(self):
        return {"type": self.type, "default-sort-order-id": self.sort_order_id}


@dataclass
class AssertLastAssignedFieldID(Requirement):
    last_assigned_field_id: int
    type = "assert-last-assigned-field-id"

    def validate(self, md):
        if md is None or md.last_column_id != self.last_assigned_field_id:
            raise CommitStateError("last assigned field id changed")

    def to_json(self):
        return {"type": self.type, "last-assigned-field-id": self.last_assigned_field_id}


@dataclass
class AssertLastAssignedPartitionID(Requirement):
    last_assigned_partition_id: int
    type = "assert-last-assigned-partition-id"

    def validate(self, md):
        if md is None or md.last_partition_id != self.last_assigned_partition_id:
            raise CommitStateError("last assigned partition id changed")

    def to_json(self):
        return {
            "type": self.type,
            "last-assigned-partition-id": self.last_assigned_partition_id,
        }


# -------------------------------------------------------------- transaction

class Transaction:
    """Accumulates updates+requirements, validates, single CAS commit —
    ref table/transaction.go:63-120, 608-635."""

    def __init__(self, table):
        self.table = table
        self.base = table.metadata
        self.base_location = table.metadata_location
        self.updates: list[Update] = []
        self.requirements: list[Requirement] = []
        self._builder = MetadataBuilder(self.base)

    # -------------------------------------------------------------- apply

    def apply(self, updates: list[Update], requirements: list[Requirement]) -> None:
        """Validate requirements against current accumulated state, then
        apply updates — ref transaction.go:73-120."""
        staged = self._builder.build()
        for req in requirements:
            req.validate(staged)
        for u in updates:
            u.apply(self._builder)
        self.updates.extend(updates)
        self.requirements.extend(requirements)

    # ------------------------------------------------------- conveniences

    def set_properties(self, props: dict[str, str]) -> "Transaction":
        self.apply([SetProperties(props)], [])
        return self

    def remove_properties(self, *keys: str) -> "Transaction":
        self.apply([RemoveProperties(list(keys))], [])
        return self

    def add_schema(self, schema: Schema, make_current: bool = True) -> "Transaction":
        ups: list[Update] = [AddSchemaUpdate(schema)]
        if make_current:
            ups.append(SetCurrentSchema(schema.schema_id))
        self.apply(ups, [AssertTableUUID(self.base.table_uuid)])
        return self

    def set_ref(
        self, name: str, snapshot_id: int, ref_type: str = "branch", **retention
    ) -> "Transaction":
        self.apply(
            [SetSnapshotRef(name, snapshot_id, ref_type, **retention)],
            [AssertTableUUID(self.base.table_uuid)],
        )
        return self

    def remove_ref(self, name: str) -> "Transaction":
        self.apply([RemoveSnapshotRef(name)], [AssertTableUUID(self.base.table_uuid)])
        return self

    def expire_snapshots(
        self,
        older_than_ms: Optional[int] = None,
        retain_last: int = 1,
        now_ms: Optional[int] = None,
    ) -> "Transaction":
        """Retention walk — ref table/transaction.go:276-363, honoring
        per-ref retention (refs.go): stale tags/branches beyond
        max-ref-age-ms are dropped first, then each surviving branch
        protects its ancestor chain per min-snapshots-to-keep /
        max-snapshot-age-ms before general expiry applies."""
        md = self._builder.build()
        now = now_ms if now_ms is not None else int(time.time() * 1000)

        # 1. drop refs past their max-ref-age (main is never dropped)
        stale_refs = []
        for name, r in md.refs.items():
            if name == MAIN_BRANCH:
                continue
            snap = md.snapshot_by_id(r.snapshot_id)
            if snap is None:
                # dangling ref (snapshot vanished) — dead either way
                stale_refs.append(name)
            elif r.max_ref_age_ms is not None and now - snap.timestamp_ms > r.max_ref_age_ms:
                stale_refs.append(name)
        if stale_refs:
            self.apply(
                [RemoveSnapshotRef(n) for n in stale_refs],
                [AssertTableUUID(self.base.table_uuid)],
            )
            md = self._builder.build()

        # 2. protected ancestors per branch retention
        by_id = {s.snapshot_id: s for s in md.snapshots}
        keep: set[int] = set()
        for name, r in md.refs.items():
            if r.snapshot_id in by_id:
                keep.add(r.snapshot_id)
            if r.snapshot_ref_type != "branch":
                continue
            min_keep = r.min_snapshots_to_keep or 1
            max_age = r.max_snapshot_age_ms
            cur = by_id.get(r.snapshot_id)
            kept = 0
            while cur is not None:
                # age protection only applies when the ref sets an age;
                # otherwise just the min-snapshots-to-keep chain is kept
                within_age = max_age is not None and now - cur.timestamp_ms <= max_age
                if kept < min_keep or within_age:
                    keep.add(cur.snapshot_id)
                    kept += 1
                    cur = by_id.get(cur.parent_snapshot_id)
                else:
                    break

        # 3. general expiry over the remainder
        ordered = sorted(md.snapshots, key=lambda s: s.timestamp_ms, reverse=True)
        keep.update(s.snapshot_id for s in ordered[:retain_last])
        expired = [
            s.snapshot_id
            for s in ordered[retain_last:]
            if s.snapshot_id not in keep
            and (older_than_ms is None or s.timestamp_ms < older_than_ms)
        ]
        if expired:
            self.apply([RemoveSnapshots(expired)], [AssertTableUUID(self.base.table_uuid)])
        return self

    # ------------------------------------------------------ snapshot path

    def commit_snapshot_from_manifests(
        self,
        snapshot_id: int,
        commit_uuid: str,
        manifests: list[ManifestFile],
        summary: Summary,
        parent_snapshot_id: Optional[int],
        branch: str = MAIN_BRANCH,
        carried_manifests: Optional[list] = None,
    ) -> Snapshot:
        """One manifest-list write + AddSnapshot/SetSnapshotRef updates
    guarded by AssertRefSnapshotID — ref transaction.go:157-225
        (commitSnapshotFromManifestsWithRequirement).

        `carried_manifests` overrides the default carry-forward of ALL
        parent manifests — the merge-append path passes the parent set
        minus the manifests it bin-packed into this commit's merged
        ones."""
        import os

        md = self._builder.build()
        seq = self._builder.next_sequence_number()
        # carry forward the parent's manifests (fast append semantics)
        parent = md.snapshot_by_id(parent_snapshot_id) if parent_snapshot_id else None
        all_manifests = list(manifests)
        if carried_manifests is not None:
            all_manifests.extend(carried_manifests)
        elif parent is not None:
            all_manifests.extend(parent.manifests())
        # stamp this snapshot's sequence number on the new manifests; a
        # merged-append manifest carries EXISTING entries with explicit
        # older sequence numbers — its min_sequence_number (computed from
        # them at write time) must survive the stamp, or delete-manifest
        # sequence gating would skip deletes that still apply
        for m in manifests:
            m.sequence_number = seq
            m.min_sequence_number = (
                min(m.min_sequence_number, seq) if m.min_sequence_number else seq
            )
        list_path = os.path.join(
            md.location,
            "metadata",
            f"snap-{snapshot_id}-1-{commit_uuid}.avro",
        )
        # guarded mkdir: an object-store list_path must not leave a
        # literal "s3:/..." directory on the driver's local disk
        from .fileio import makedirs as _fio_makedirs

        _fio_makedirs(os.path.dirname(list_path))
        # v3: the list writer assigns row-lineage ids to data manifests
        # lacking one (new + pre-upgrade carried); the snapshot records
        # the id range it consumed — ref manifest.go:1478-1486
        fv = md.format_version
        first_row_id = (md.next_row_id or 0) if fv >= 3 else None
        assigned = write_manifest_list(
            list_path,
            all_manifests,
            format_version=fv,
            first_row_id=first_row_id,
            snapshot_id=snapshot_id,
            sequence_number=seq,
            parent_snapshot_id=parent_snapshot_id,
        )
        snap = Snapshot(
            snapshot_id=snapshot_id,
            parent_snapshot_id=parent_snapshot_id,
            sequence_number=seq,
            timestamp_ms=int(time.time() * 1000),
            manifest_list=list_path,
            summary=summary,
            schema_id=md.current_schema_id,
            first_row_id=first_row_id,
            added_rows=assigned if fv >= 3 else None,
        )
        self.apply(
            [AddSnapshotUpdate(snap), SetSnapshotRef(branch, snapshot_id)],
            [
                AssertTableUUID(self.base.table_uuid),
                AssertRefSnapshotID(branch, parent_snapshot_id),
            ],
        )
        return snap

    # -------------------------------------------------------------- commit

    def commit(self) -> None:
        """ref transaction.go:608-635 + table.go:220-233 (doCommit).

        REST catalogs commit the update/requirement delta over the wire
        (the server applies + CAS-checks); file/SQL catalogs commit the
        locally-built metadata blob with their own CAS."""
        if not self.updates:
            return
        if hasattr(self.table.catalog, "commit_via_updates"):
            new_md = self.table.catalog.commit_via_updates(
                self.table.identifier, self.updates, self.requirements
            )
            self.table.metadata = new_md
            return
        new_md = self._builder.build()
        logged_md, trimmed = self._with_log(new_md)
        new_location = self.table.catalog.commit_table(
            self.table.identifier, self.base_location, logged_md
        )
        self.table.metadata = logged_md
        self.table.metadata_location = new_location
        self._post_commit_cleanup(logged_md, trimmed)

    def _post_commit_cleanup(self, md: TableMetadata, trimmed: list[str]) -> None:
        """Delete metadata JSON trimmed out of the log after commit when
        write.metadata.delete-after-commit.enabled — ref table.go:247-279
        + properties.go:70-77."""
        import os

        if md.properties.get("write.metadata.delete-after-commit.enabled", "false") != "true":
            return
        for path in trimmed:
            try:
                if os.path.exists(path) and path != self.table.metadata_location:
                    os.unlink(path)
            except OSError:
                pass

    def _with_log(self, md: TableMetadata) -> tuple[TableMetadata, list[str]]:
        b = MetadataBuilder(md)
        b.append_metadata_log(self.base_location)
        return b.build(), b.trimmed_metadata_files


@dataclass
class SetStatistics(Update):
    """ref table/updates.go SetStatistics (Puffin stats entry)."""

    statistics: dict
    action = "set-statistics"

    def apply(self, b):
        b.set_statistics(self.statistics)

    def to_json(self):
        return {"action": self.action, "statistics": self.statistics}


@dataclass
class RemoveStatistics(Update):
    snapshot_id: int
    action = "remove-statistics"

    def apply(self, b):
        b.remove_statistics(self.snapshot_id)

    def to_json(self):
        return {"action": self.action, "snapshot-id": self.snapshot_id}


@dataclass
class SetPartitionStatistics(Update):
    """ref table/statistics.go:79-87 (PartitionStatisticsFile entry)."""

    statistics: dict
    action = "set-partition-statistics"

    def apply(self, b):
        b.set_partition_statistics(self.statistics)

    def to_json(self):
        return {"action": self.action, "partition-statistics": self.statistics}


@dataclass
class RemovePartitionStatistics(Update):
    snapshot_id: int
    action = "remove-partition-statistics"

    def apply(self, b):
        b.remove_partition_statistics(self.snapshot_id)

    def to_json(self):
        return {"action": self.action, "snapshot-id": self.snapshot_id}
