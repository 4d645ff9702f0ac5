"""v3 field default values (initial-default): applied on read only to
rows from files that physically lack the column; files containing the
column keep stored values including explicit nulls. Mirrors the
reference's default-value surface (types.go:189-190, gated to v3 by
metadata_schema_comptability.go:99-106)."""

from __future__ import annotations

import copy
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.manifest import (
    DataFile,
    ManifestEntry,
    ManifestEntryStatus,
    write_manifest,
    write_manifest_list,
)
from iceberg_go_distributed_spark.iceberg.metadata import (
    CommitStateError,
    MetadataBuilder,
    Snapshot,
    SnapshotLogEntry,
    SnapshotRef,
    Summary,
)
from iceberg_go_distributed_spark.iceberg.table import Table
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

BASE_SCHEMA = Schema.of(
    1,
    NestedField(1, "id", ty.LongType(), required=True),
    NestedField(2, "val", ty.DoubleType()),
)


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "warehouse"))


def _arrow_field(name, typ, field_id):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(field_id).encode()})


def test_initial_default_applied_only_to_old_files(fs_catalog, spark, tmp_path):
    t = fs_catalog.create_table("db.defaults", BASE_SCHEMA)
    # file 1: written before the column existed
    df1 = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, val double")
    t.append(df1.coalesce(1))

    # file 2: written by a (simulated) v3 writer AFTER the column was
    # added — contains real values and one explicit null
    f2 = str(tmp_path / "file2.parquet")
    tbl2 = pa.table(
        {
            "id": pa.array([100, 101, 102], pa.int64()),
            "val": pa.array([1.0, 2.0, 3.0]),
            "category": pa.array(["a", None, "c"]),
        },
        schema=pa.schema(
            [
                _arrow_field("id", pa.int64(), 1),
                _arrow_field("val", pa.float64(), 2),
                _arrow_field("category", pa.string(), 3),
            ]
        ),
    )
    pq.write_table(tbl2, f2)

    new_schema = Schema.of(
        2,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "val", ty.DoubleType()),
        NestedField(
            3,
            "category",
            ty.StringType(),
            initial_default="unknown",
            write_default="unknown",
        ),
    )
    entry = ManifestEntry(
        status=ManifestEntryStatus.ADDED,
        snapshot_id=77,
        sequence_number=2,
        file_sequence_number=2,
        data_file=DataFile(
            file_path=f2, record_count=3, file_size_in_bytes=pq.read_metadata(f2).serialized_size
        ),
    )
    m2 = str(tmp_path / "m2.avro")
    mf = write_manifest(m2, t.metadata.default_spec(), new_schema, 77, [entry])
    old = t.current_snapshot()
    ml = str(tmp_path / "ml2.avro")
    write_manifest_list(ml, list(old.manifests()) + [mf])

    md = copy.deepcopy(t.metadata)
    md.format_version = 3
    md.schemas.append(new_schema)
    md.current_schema_id = 2
    md.last_column_id = 3
    snap = Snapshot(77, 2, int(time.time() * 1000), ml, Summary("append"),
                    parent_snapshot_id=old.snapshot_id, schema_id=2)
    md.snapshots.append(snap)
    md.current_snapshot_id = 77
    md.last_sequence_number = 2
    md.refs["main"] = SnapshotRef(77, "branch")
    md.snapshot_log.append(SnapshotLogEntry(77, snap.timestamp_ms))
    t2 = Table(t.identifier, md, t.metadata_location, t.catalog)

    rows = {r.id: r.category for r in t2.scan().to_df(spark).collect()}
    assert len(rows) == 13
    # pre-evolution rows: the default, not null
    assert all(rows[i] == "unknown" for i in range(10))
    # post-evolution rows: stored values survive — INCLUDING the
    # explicit null (this is why the fill is when(missing), not coalesce)
    assert rows[100] == "a" and rows[102] == "c"
    assert rows[101] is None


def test_initial_default_gated_to_v3():
    from tests.test_metadata_validation import VALID_V2
    from iceberg_go_distributed_spark.iceberg.metadata import TableMetadata

    md = TableMetadata.from_json(VALID_V2)
    bad = Schema.of(
        9, NestedField(10, "c", ty.StringType(), initial_default="x")
    )
    with pytest.raises(CommitStateError, match="initial-default"):
        MetadataBuilder(md).add_schema(bad)
