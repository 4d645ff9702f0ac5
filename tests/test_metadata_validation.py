"""Metadata JSON validation — the reference's golden-fixture corpus
(table/testdata/TableMetadataV2Valid.json + invalid variants, exercised
by table/metadata_internal_test.go) reconstructed programmatically:
one spec-complete valid V2 document plus the invalid mutations, each of
which must be rejected at parse time."""

from __future__ import annotations

import copy

import pytest

from iceberg_go_distributed_spark.iceberg.metadata import (
    CommitStateError,
    MetadataBuilder,
    TableMetadata,
)

VALID_V2 = {
    "format-version": 2,
    "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
    "location": "s3://bucket/test/location",
    "last-sequence-number": 34,
    "last-updated-ms": 1602638573590,
    "last-column-id": 3,
    "current-schema-id": 1,
    "schemas": [
        {"type": "struct", "schema-id": 0, "fields": [{"id": 1, "name": "x", "required": True, "type": "long"}]},
        {
            "type": "struct",
            "schema-id": 1,
            "identifier-field-ids": [1, 2],
            "fields": [
                {"id": 1, "name": "x", "required": True, "type": "long"},
                {"id": 2, "name": "y", "required": True, "type": "long", "doc": "comment"},
                {"id": 3, "name": "z", "required": True, "type": "long"},
            ],
        },
    ],
    "default-spec-id": 0,
    "partition-specs": [
        {"spec-id": 0, "fields": [{"name": "x", "transform": "identity", "source-id": 1, "field-id": 1000}]}
    ],
    "last-partition-id": 1000,
    "default-sort-order-id": 3,
    "sort-orders": [
        {
            "order-id": 3,
            "fields": [
                {"transform": "identity", "source-id": 2, "direction": "asc", "null-order": "nulls-first"},
                {"transform": "bucket[4]", "source-id": 3, "direction": "desc", "null-order": "nulls-last"},
            ],
        }
    ],
    "properties": {},
    "current-snapshot-id": 3055729675574597004,
    "snapshots": [
        {
            "snapshot-id": 3051729675574597004,
            "timestamp-ms": 1515100955770,
            "sequence-number": 0,
            "summary": {"operation": "append"},
            "manifest-list": "s3://a/b/1.avro",
        },
        {
            "snapshot-id": 3055729675574597004,
            "parent-snapshot-id": 3051729675574597004,
            "timestamp-ms": 1555100955770,
            "sequence-number": 1,
            "summary": {"operation": "append"},
            "manifest-list": "s3://a/b/2.avro",
            "schema-id": 1,
        },
    ],
    "snapshot-log": [
        {"snapshot-id": 3051729675574597004, "timestamp-ms": 1515100955770},
        {"snapshot-id": 3055729675574597004, "timestamp-ms": 1555100955770},
    ],
    "metadata-log": [],
}


def test_valid_v2_parses():
    md = TableMetadata.from_json(VALID_V2)
    assert md.table_uuid == VALID_V2["table-uuid"]
    assert md.current_schema().schema_id == 1
    assert md.current_schema().identifier_field_ids == (1, 2)
    assert md.current_snapshot().snapshot_id == 3055729675574597004
    assert md.current_snapshot().parent_snapshot_id == 3051729675574597004
    assert md.default_spec().fields[0].name == "x"
    assert md.sort_orders[0].order_id == 3
    assert md.snapshot_as_of(1515100955771).snapshot_id == 3051729675574597004


def test_roundtrip_preserves_content():
    md = TableMetadata.from_json(VALID_V2)
    md2 = TableMetadata.from_json(md.to_json())
    assert md2.to_json() == md.to_json()


def _variant(**mutations):
    doc = copy.deepcopy(VALID_V2)
    doc.update(mutations)
    return doc


@pytest.mark.parametrize(
    "doc,why",
    [
        (_variant(**{"format-version": 99}), "unsupported format version"),
        ({k: v for k, v in VALID_V2.items() if k != "table-uuid"}, "missing uuid"),
        (_variant(schemas=[]), "no schemas"),
        (_variant(**{"current-schema-id": 5}), "current schema not found"),
        (_variant(**{"default-spec-id": 9}), "default spec not found"),
        (_variant(**{"default-sort-order-id": 7}), "sort order not found"),
        (_variant(**{"current-snapshot-id": 123}), "current snapshot not found"),
        (
            _variant(**{"sort-orders": []}),
            "v2 empty sort orders",
        ),
        ({k: v for k, v in VALID_V2.items() if k != "schemas"}, "v2 without schemas"),
        # ref metadata.go:1492-1496 (validate): the v1 fallbacks
        # (max spec id / first sort order) must NOT apply to v2+
        (
            {k: v for k, v in VALID_V2.items() if k != "default-spec-id"},
            "v2 without default-spec-id",
        ),
        (
            {k: v for k, v in VALID_V2.items() if k != "default-sort-order-id"},
            "v2 without default-sort-order-id",
        ),
    ],
)
def test_invalid_variants_rejected(doc, why):
    with pytest.raises(ValueError, match="."):
        md = TableMetadata.from_json(doc)
        # empty sort-orders list falls back only when key absent; an
        # explicitly empty list in v2 is invalid
        if why == "v2 empty sort orders" and md.sort_orders:
            raise AssertionError("accepted invalid doc")


def test_builder_sequence_monotonicity():
    from iceberg_go_distributed_spark.iceberg.metadata import Snapshot, Summary

    md = TableMetadata.from_json(VALID_V2)
    b = MetadataBuilder(md)
    bad = Snapshot(
        snapshot_id=999,
        sequence_number=1,  # not > last (34)
        timestamp_ms=md.last_updated_ms + 1,
        manifest_list="s3://a/b/3.avro",
        summary=Summary("append"),
        parent_snapshot_id=md.current_snapshot_id,
    )
    with pytest.raises(CommitStateError, match="sequence number"):
        b.add_snapshot(bad)

    dup = Snapshot(
        snapshot_id=3055729675574597004,  # already exists
        sequence_number=35,
        timestamp_ms=md.last_updated_ms + 1,
        manifest_list="s3://a/b/3.avro",
        summary=Summary("append"),
    )
    with pytest.raises(CommitStateError, match="already exists"):
        MetadataBuilder(md).add_snapshot(dup)


def test_builder_ref_and_removal_guards():
    md = TableMetadata.from_json(VALID_V2)
    with pytest.raises(CommitStateError, match="unknown snapshot"):
        MetadataBuilder(md).set_snapshot_ref("branchx", 42)
    with pytest.raises(CommitStateError, match="still referenced"):
        MetadataBuilder(md).remove_snapshots([3055729675574597004])
    # unreferenced ancestor can be removed
    b = MetadataBuilder(md)
    b.remove_snapshots([3051729675574597004])
    assert len(b.build().snapshots) == 1


def test_v1_parses_with_defaults():
    doc = {
        "format-version": 1,
        "table-uuid": "d20125c8-7284-442c-9aea-15fee620737c",
        "location": "s3://bucket/t",
        "last-updated-ms": 1602638573874,
        "last-column-id": 1,
        "schema": {
            "type": "struct",
            "fields": [{"id": 1, "name": "x", "required": True, "type": "long"}],
        },
        "partition-spec": [],
    }
    md = TableMetadata.from_json(doc)
    assert md.current_schema().fields[0].name == "x"
    assert md.default_spec().is_unpartitioned()
    assert md.format_version == 2  # we upgrade on write


def test_v1_legacy_schema_appended_when_absent_from_list():
    """ref metadata.go:1690-1697 (metadataV1.UnmarshalJSON): a v1 doc
    carrying BOTH a `schemas` list and a legacy `schema` whose id no
    listed schema matches appends the legacy schema and parses."""
    doc = {
        "format-version": 1,
        "table-uuid": "d20125c8-7284-442c-9aea-15fee620737c",
        "location": "s3://bucket/t",
        "last-updated-ms": 1602638573874,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "x", "required": True, "type": "long"}
                ],
            }
        ],
        "schema": {
            "type": "struct",
            "schema-id": 5,
            "fields": [
                {"id": 1, "name": "x", "required": True, "type": "long"},
                {"id": 2, "name": "y", "required": False, "type": "string"},
            ],
        },
        "partition-spec": [],
    }
    md = TableMetadata.from_json(doc)
    assert md.current_schema_id == 5
    assert [f.name for f in md.current_schema().fields] == ["x", "y"]
    # both schemas survive the parse
    assert {s.schema_id for s in md.schemas} == {0, 5}


# --------------------------------------------------------------------- v3

def _valid_v3() -> dict:
    """V3 variant of the golden doc: ns-timestamp column, row lineage
    (next-row-id / first-row-id / added-rows) — mirrors the reference's
    metadataV3 surface (table/metadata.go:1772-1796)."""
    doc = copy.deepcopy(VALID_V2)
    doc["format-version"] = 3
    doc["next-row-id"] = 4000
    doc["schemas"][1]["fields"].append(
        {"id": 4, "name": "ts_ns", "required": False, "type": "timestamp_ns"}
    )
    doc["last-column-id"] = 4
    doc["snapshots"][1]["first-row-id"] = 1000
    doc["snapshots"][1]["added-rows"] = 3000
    return doc


def test_v3_parses_and_roundtrips():
    md = TableMetadata.from_json(_valid_v3())
    assert md.format_version == 3
    assert md.next_row_id == 4000
    snap = md.current_snapshot()
    assert snap.first_row_id == 1000 and snap.added_rows == 3000
    ts_ns = md.current_schema().fields[-1].field_type
    assert ts_ns.name == "timestamp_ns"
    out = md.to_json()
    assert out["format-version"] == 3
    assert out["next-row-id"] == 4000
    snap_out = [s for s in out["snapshots"] if s.get("first-row-id") is not None]
    assert snap_out and snap_out[0]["added-rows"] == 3000
    # parse the emitted JSON again — full round trip
    again = TableMetadata.from_json(out)
    assert again.next_row_id == 4000


def test_v3_ns_timestamp_maps_to_spark_microseconds():
    from iceberg_go_distributed_spark.iceberg.types import (
        TimestampNsType,
        TimestampTzNsType,
        min_format_version_for_type,
        spark_type,
    )

    # downcast policy: ns → Spark's µs timestamps (ref arrow_utils.go:388)
    assert spark_type(TimestampNsType()) == "timestamp_ntz"
    assert spark_type(TimestampTzNsType()) == "timestamp"
    assert min_format_version_for_type(TimestampNsType()) == 3
    assert min_format_version_for_type(TimestampTzNsType()) == 3


def test_v3_commit_requires_row_lineage():
    """v3 commits are supported (round 5) but only with row lineage: a
    lineage-less snapshot is refused, a lineage-carrying one advances
    next-row-id. Reads (time travel) work either way."""
    from dataclasses import replace

    from iceberg_go_distributed_spark.iceberg.metadata import Snapshot, Summary

    md = TableMetadata.from_json(_valid_v3())
    # reads: time travel over the v3 snapshot log works
    assert md.snapshot_as_of(1515100955771).snapshot_id == 3051729675574597004
    # a v2-style snapshot (no lineage fields) would break row lineage
    snap = Snapshot(1, 35, 1999999999999, "s3://a/b/3.avro", Summary("append"))
    with pytest.raises(CommitStateError, match="row lineage"):
        MetadataBuilder(md).add_snapshot(snap)
    # the lineage-carrying equivalent commits and advances next-row-id
    base = md.next_row_id
    good = replace(snap, first_row_id=base, added_rows=123)
    b = MetadataBuilder(md)
    b.add_snapshot(good)
    assert b.m.next_row_id == base + 123


def test_ns_type_gated_out_of_v2_schema():
    from iceberg_go_distributed_spark.iceberg.types import (
        NestedField,
        Schema,
        TimestampNsType,
    )

    md = TableMetadata.from_json(VALID_V2)
    bad = Schema.of(9, NestedField(10, "ts", TimestampNsType(), required=False))
    with pytest.raises(CommitStateError, match="requires format"):
        MetadataBuilder(md).add_schema(bad)


class TestMetadataCompression:
    """write.metadata.compression-codec (ref properties.go:76-77,
    locations.go:66-75): gzip payload + .gz.metadata.json naming on the
    SQL catalog; explicit refusal on the version-hint FS layout."""

    SCHEMA = None  # set lazily to avoid import-order noise

    @staticmethod
    def _schema():
        from iceberg_go_distributed_spark.iceberg.types import (
            LongType,
            NestedField,
            Schema,
        )

        return Schema.of(0, NestedField(1, "id", LongType(), required=True))

    def test_sql_catalog_gzip_roundtrip(self, tmp_path):
        import gzip as _gz

        from iceberg_go_distributed_spark.iceberg.catalog import SqlCatalog

        cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
        cat.create_namespace("db")
        t = cat.create_table(
            "db.gz",
            self._schema(),
            properties={"write.metadata.compression-codec": "gzip"},
        )
        assert t.metadata_location.endswith(".gz.metadata.json")
        with open(t.metadata_location, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"  # gzip magic on disk
        # a commit keeps the codec and stays loadable
        tx = t.transaction()
        tx.set_properties({"k": "v"})
        tx.commit()
        t2 = cat.load_table("db.gz")
        assert t2.metadata_location.endswith(".gz.metadata.json")
        assert t2.metadata.properties["k"] == "v"
        # flipping the codec off produces a plain file again
        tx = t2.transaction()
        tx.set_properties({"write.metadata.compression-codec": "none"})
        tx.commit()
        t3 = cat.load_table("db.gz")
        assert t3.metadata_location.endswith(".metadata.json")
        assert not t3.metadata_location.endswith(".gz.metadata.json")
        with open(t3.metadata_location, "rb") as f:
            assert f.read(1) == b"{"

    def test_invalid_codec_refused(self, tmp_path):
        import pytest

        from iceberg_go_distributed_spark.iceberg.catalog import SqlCatalog

        cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
        cat.create_namespace("db")
        with pytest.raises(ValueError, match="unsupported write metadata compression"):
            cat.create_table(
                "db.bad",
                self._schema(),
                properties={"write.metadata.compression-codec": "zstd"},
            )

    def test_fs_catalog_refuses_gzip(self, tmp_path):
        import pytest

        from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog

        cat = FileSystemCatalog(str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="does not support"):
            cat.create_table(
                "db.gz",
                self._schema(),
                properties={"write.metadata.compression-codec": "gzip"},
            )
        # ...and at commit time too (property set after creation)
        t = cat.create_table("db.plain", self._schema())
        tx = t.transaction()
        tx.set_properties({"write.metadata.compression-codec": "gzip"})
        with pytest.raises(ValueError, match="does not support"):
            tx.commit()
