"""Manifest wire-format goldens transcribed from the REFERENCE's own
hand-built corpus — manifest_test.go (1,498 lines): the NYC-taxis
schema, partition spec, two fully-statted data-file entries with exact
expected byte values for every bounds/counts map, and the manifest-list
records with their field-level expectations (TestManifestEntriesV1/V2/V3,
TestReadManifestListV1/V2/V3). Until a second engine is installable in
this sandbox (no Go toolchain, so reference-WRITTEN bytes are not
producible), these reference-authored values are the strongest
cross-implementation evidence for the Avro layer: the repo's writer must
round-trip EXACTLY the values the reference's tests pin, not merely its
own output (the same upgrade test_reference_fixture_goldens.py gave the
metadata layer in r9). Honesty note: like the reference suite itself,
this is a write-then-read corpus, so the fixture dicts alone cannot
catch their own transcription typos — the v2 test therefore re-asserts
spot values as INDEPENDENT literals copied from the Go suite's assert
block (its second copy of every value), verified to trip on tampering.

Scope note: this engine writes v2/v3 manifests only (v1 tables upgrade
on write, metadata.py:from_json), so the v1-WRITER assertions
(manifest_test.go:538-555) are out of scope. The v1 READ path IS
covered below: foreign v1 manifest/list files (schemas transcribed from
internal/avro_schemas.go — required snapshot_id, block_size_in_bytes,
nullable counts, no content/sequence fields) are synthesized byte-level
and read back with the reference's exact default/sentinel semantics."""

from __future__ import annotations

import json

import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.manifest import (
    DataFile,
    DataFileContent,
    FieldSummary,
    ManifestContent,
    ManifestEntry,
    ManifestEntryStatus,
    ManifestFile,
    read_manifest,
    read_manifest_list,
    write_manifest,
    write_manifest_list,
)
from iceberg_go_distributed_spark.iceberg.partitioning import (
    PartitionField,
    PartitionSpec,
)
from iceberg_go_distributed_spark.iceberg.transforms import IdentityTransform
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

# ---- manifest_test.go:36-39,96 — the suite's golden constants
SNAPSHOT_ID = 9182715666859759686
ENTRY_SNAPSHOT_ID = 8744736658442914487
ADDED_ROWS = 237993

# ---- manifest_test.go:450-470 — testSchema (NYC taxis, 19 fields;
# note the REFERENCE's own quirk: ids 1 and 19 share the name VendorID)
TAXIS_SCHEMA = Schema(
    0,
    (
        NestedField(1, "VendorID", ty.IntegerType(), True),
        NestedField(2, "tpep_pickup_datetime", ty.TimestampType(), True),
        NestedField(3, "tpep_dropoff_datetime", ty.TimestampType(), True),
        NestedField(4, "passenger_count", ty.LongType(), False),
        NestedField(5, "trip_distance", ty.DoubleType(), True),
        NestedField(6, "RatecodeID", ty.LongType(), False),
        NestedField(7, "store_and_fwd_flag", ty.StringType(), False),
        NestedField(8, "PULocationID", ty.IntegerType(), False),
        NestedField(9, "DOLocationID", ty.IntegerType(), False),
        NestedField(10, "payment_type", ty.LongType(), True),
        NestedField(11, "fare_amount", ty.DoubleType(), True),
        NestedField(12, "extra", ty.DoubleType(), False),
        NestedField(13, "mta_tax", ty.DoubleType(), False),
        NestedField(14, "tip_amount", ty.DoubleType(), False),
        NestedField(15, "tolls_amount", ty.DoubleType(), False),
        NestedField(16, "improvement_surcharge", ty.DoubleType(), False),
        NestedField(17, "total_amount", ty.DoubleType(), True),
        NestedField(18, "congestion_surcharge", ty.DoubleType(), False),
        NestedField(19, "VendorID", ty.IntegerType(), False),
    ),
)

# ---- manifest_test.go:510-512 — NewPartitionSpecID(1, ...)
TAXIS_SPEC = PartitionSpec(
    1,
    (
        PartitionField(1, 1000, "VendorID", IdentityTransform()),
        PartitionField(2, 1001, "tpep_pickup_datetime", IdentityTransform()),
    ),
)

# time.Unix(1925, 0).UnixMicro() — manifest_test.go:109
PICKUP_US = 1_925_000_000
PARTITION = {"VendorID": 1, "tpep_pickup_datetime": PICKUP_US}

ALL19 = range(1, 20)

# ---- manifest_test.go:96-221 — dataRecord0 (exact expected values the
# reference re-asserts field by field at :570-683)
DATA0 = dict(
    file_path=(
        "/home/iceberg/warehouse/nyc/taxis_partitioned/data/VendorID=null/"
        "00000-633-d8a4223e-dc97-45a1-86e1-adaba6e8abd7-00001.parquet"
    ),
    record_count=19513,
    file_size_in_bytes=388872,
    column_sizes={
        1: 53, 2: 98153, 3: 98693, 4: 53, 5: 53, 6: 53, 7: 17425,
        8: 18528, 9: 53, 10: 44788, 11: 35571, 12: 53, 13: 1243,
        14: 2355, 15: 12750, 16: 4029, 17: 110, 18: 47194, 19: 2948,
    },
    value_counts={i: 19513 for i in ALL19},
    null_value_counts={
        1: 19513, 2: 0, 3: 0, 4: 19513, 5: 19513, 6: 19513, 7: 0, 8: 0,
        9: 19513, 10: 0, 11: 0, 12: 19513, 13: 0, 14: 0, 15: 0, 16: 0,
        17: 0, 18: 0, 19: 0,
    },
    nan_value_counts={i: 0 for i in range(10, 20)},
    lower_bounds={
        2: b"2020-04-01 00:00",
        3: b"2020-04-01 00:12",
        7: b"\x03\x00\x00\x00",
        8: b"\x01\x00\x00\x00",
        10: b"\xf6(\\\x8f\xc2\x05S\xc0",
        11: b"\x00" * 8,
        13: b"\x00" * 8,
        14: b"\x00\x00\x00\x00\x00\x00\xe0\xbf",
        15: b")\\\x8f\xc2\xf5(\x08\xc0",
        16: b"\x00" * 8,
        17: b"\x00" * 8,
        18: b"\xf6(\\\x8f\xc2\xc5S\xc0",
        19: b"\x00\x00\x00\x00\x00\x00\x04\xc0",
    },
    upper_bounds={
        2: b"2020-04-30 23:5:",
        3: b"2020-05-01 00:41",
        7: b"\t\x01\x00\x00",
        8: b"\t\x01\x00\x00",
        10: b"\xcd\xcc\xcc\xcc\xcc,_@",
        11: b"\x1f\x85\xebQ\\\xe2\xfe@",
        13: b"\x00\x00\x00\x00\x00\x00\x12@",
        14: b"\x00\x00\x00\x00\x00\x00\xe0?",
        15: b"q=\n\xd7\xa3\xf01@",
        16: b"\x00\x00\x00\x00\x00`B@",
        17: b"333333\xd3?",
        18: b"\x00\x00\x00\x00\x00\x18b@",
        19: b"\x00\x00\x00\x00\x00\x00\x04@",
    },
    split_offsets=[4],
    sort_order_id=0,
    partition=dict(PARTITION),
)

# ---- manifest_test.go:221-350 — dataRecord1
DATA1 = dict(
    file_path=(
        "/home/iceberg/warehouse/nyc/taxis_partitioned/data/VendorID=1/"
        "00000-633-d8a4223e-dc97-45a1-86e1-adaba6e8abd7-00002.parquet"
    ),
    record_count=95050,
    file_size_in_bytes=1265950,
    column_sizes={
        1: 318, 2: 329806, 3: 331632, 4: 15343, 5: 2351, 6: 3389,
        7: 71269, 8: 76429, 9: 16383, 10: 86992, 11: 89608, 12: 265,
        13: 19377, 14: 1692, 15: 76162, 16: 4354, 17: 759, 18: 120650,
        19: 11804,
    },
    value_counts={i: 95050 for i in ALL19},
    null_value_counts={i: (95050 if i == 12 else 0) for i in ALL19},
    nan_value_counts={i: 0 for i in range(10, 20)},
    lower_bounds={
        1: b"\x01\x00\x00\x00",
        2: b"2020-04-01 00:00",
        3: b"2020-04-01 00:13",
        4: b"\x00\x00\x00\x00",
        5: b"\x01\x00\x00\x00",
        6: b"N",
        7: b"\x01\x00\x00\x00",
        8: b"\x01\x00\x00\x00",
        9: b"\x01\x00\x00\x00",
        **{i: b"\x00" * 8 for i in (10, 11, 13, 14, 15, 16, 17, 18, 19)},
    },
    upper_bounds={
        1: b"\x01\x00\x00\x00",
        2: b"2020-04-30 23:5:",
        3: b"2020-05-01 00:1:",
        4: b"\x06\x00\x00\x00",
        5: b"c\x00\x00\x00",
        6: b"Y",
        7: b"\t\x01\x00\x00",
        8: b"\t\x01\x00\x00",
        9: b"\x04\x01\x00\x00",
        10: b"\\\x8f\xc2\xf5(8\x8c@",
        11: b"\xcd\xcc\xcc\xcc\xcc,f@",
        13: b"\x00\x00\x00\x00\x00\x00\x1c@",
        14: b"\x9a\x99\x99\x99\x99\x99\xf1?",
        15: b"\x00\x00\x00\x00\x00\x00Y@",
        16: b"\x00\x00\x00\x00\x00\xb0X@",
        17: b"333333\xd3?",
        18: b"\xc3\xf5(\\\x8f:\x8c@",
        19: b"\x00\x00\x00\x00\x00\x00\x04@",
    },
    split_offsets=[4],
    sort_order_id=0,
    partition=dict(PARTITION),
)

STAT_FIELDS = (
    "column_sizes", "value_counts", "null_value_counts",
    "nan_value_counts", "lower_bounds", "upper_bounds",
)


def _entries(first_row_id=None):
    out = []
    for rec in (DATA0, DATA1):
        df = DataFile(**rec, first_row_id=first_row_id)
        out.append(
            ManifestEntry(
                ManifestEntryStatus.ADDED, ENTRY_SNAPSHOT_ID, None, None, df
            )
        )
    return out


def _assert_golden_file(got: DataFile, want: dict):
    """Field-by-field against the reference's expectations
    (manifest_test.go:570-683 and the v2/v3 twins)."""
    assert got.content == DataFileContent.DATA
    assert got.file_path == want["file_path"]
    assert got.file_format == "PARQUET"
    assert got.record_count == want["record_count"]
    assert got.file_size_in_bytes == want["file_size_in_bytes"]
    for f in STAT_FIELDS:
        assert getattr(got, f) == want[f], f
    assert got.key_metadata is None          # m.Nil(datafile.KeyMetadata())
    assert got.split_offsets == [4]          # m.Equal([]int64{4}, ...)
    assert got.equality_ids is None          # m.Nil(EqualityFieldIDs())
    assert got.sort_order_id == 0            # m.Zero(*SortOrderID())
    assert got.partition == want["partition"]


def test_manifest_entries_v2_golden(tmp_path):
    """WriteManifest + FetchEntries with the reference's v2 corpus
    (manifest_test.go:1043-1199): two ADDED entries, every stats map
    byte-equal, spec/schema embedded and recoverable."""
    path = str(tmp_path / "golden-m0.avro")
    mf = write_manifest(
        path, TAXIS_SPEC, TAXIS_SCHEMA, ENTRY_SNAPSHOT_ID, _entries()
    )
    # WriteManifest computes the manifest_file row (manifest.go) —
    # reference asserts Length == written bytes and the entry tallies
    import os

    assert mf.manifest_length == os.path.getsize(path)
    assert mf.added_files_count == 2
    assert mf.added_rows_count == 19513 + 95050
    assert mf.partition_spec_id == 1
    # partition summaries from the two entries: VendorID identity 1..1,
    # pickup identity PICKUP_US..PICKUP_US, no nulls
    from iceberg_go_distributed_spark.iceberg.conversions import from_bytes

    assert from_bytes(ty.IntegerType(), mf.partitions[0].lower_bound) == 1
    assert from_bytes(ty.IntegerType(), mf.partitions[0].upper_bound) == 1
    assert mf.partitions[0].contains_null is False
    assert (
        from_bytes(ty.TimestampType(), mf.partitions[1].lower_bound)
        == PICKUP_US
    )

    entries = read_manifest(path)
    assert len(entries) == 2
    for got, want in zip(entries, (DATA0, DATA1)):
        assert got.status == ManifestEntryStatus.ADDED
        assert got.snapshot_id == ENTRY_SNAPSHOT_ID
        _assert_golden_file(got.data_file, want)

    # Spot literals transcribed from the reference's ASSERT block
    # (manifest_test.go:579-683 — the Go suite's second, independent
    # copy of each value), so a transcription typo in the fixture dicts
    # above cannot self-propagate into a vacuous pass:
    d0 = entries[0].data_file
    assert d0.record_count == 19513 and d0.file_size_in_bytes == 388872
    assert d0.column_sizes[2] == 98153 and d0.column_sizes[18] == 47194
    assert d0.null_value_counts[1] == 19513 and d0.null_value_counts[2] == 0
    assert d0.lower_bounds[2] == b"2020-04-01 00:00"
    assert d0.lower_bounds[10] == bytes(
        [0xF6, 0x28, 0x5C, 0x8F, 0xC2, 0x05, ord("S"), 0xC0]
    )
    assert d0.upper_bounds[11] == bytes(
        [0x1F, 0x85, 0xEB, ord("Q"), ord("\\"), 0xE2, 0xFE, ord("@")]
    )
    assert d0.upper_bounds[17] == bytes([0x33] * 6 + [0xD3, ord("?")])
    d1 = entries[1].data_file
    assert d1.record_count == 95050 and d1.file_size_in_bytes == 1265950
    assert d1.column_sizes[18] == 120650
    assert d1.null_value_counts[12] == 95050
    assert d1.lower_bounds[6] == b"N" and d1.upper_bounds[6] == b"Y"
    assert d1.upper_bounds[10] == bytes(
        [ord("\\"), 0x8F, 0xC2, 0xF5, ord("("), ord("8"), 0x8C, ord("@")]
    )
    # unassigned sequence numbers inherit the manifest's at read time
    # (spec inheritance — reference reads via the manifest_file wrapper)
    inherited = read_manifest(path, inherit_sequence_number=3)
    assert all(e.sequence_number == 3 for e in inherited)

    # the OCF metadata carries the schema + spec the reader recovers
    # (manifestReader.Schema()/PartitionSpec() equality, :1062-1067)
    from iceberg_go_distributed_spark.iceberg import avro as avro_io

    _, meta, _ = avro_io.read_ocf(path)
    assert Schema.from_json(json.loads(meta["schema"])) == TAXIS_SCHEMA
    spec_fields = [
        PartitionField.from_json(f)
        for f in json.loads(meta["partition-spec"])
    ]
    assert tuple(spec_fields) == TAXIS_SPEC.fields
    assert int(meta["partition-spec-id"]) == 1


def test_manifest_entries_v3_golden(tmp_path):
    """The v3 corpus (manifest_test.go:399-447, TestManifestEntriesV3):
    same two entries carrying first_row_id=1000 — lineage fields
    round-trip alongside every golden stat."""
    path = str(tmp_path / "golden-m0-v3.avro")
    write_manifest(
        path, TAXIS_SPEC, TAXIS_SCHEMA, ENTRY_SNAPSHOT_ID,
        _entries(first_row_id=1000),
    )
    entries = read_manifest(path)
    assert len(entries) == 2
    for got, want in zip(entries, (DATA0, DATA1)):
        assert got.data_file.first_row_id == 1000
        _assert_golden_file(got.data_file, want)


GOLDEN_SUMMARY = FieldSummary(
    contains_null=True,
    contains_nan=False,
    lower_bound=b"\x01\x00\x00\x00",
    upper_bound=b"\x02\x00\x00\x00",
)

GOLDEN_LIST_PATH = (
    "/home/iceberg/warehouse/nyc/taxis_partitioned/metadata/"
    "0125c686-8aa6-4502-bdcc-b6d17ca41a3b-m0.avro"
)


def _golden_manifest_file(content, seq, first_row_id=None):
    """manifest_test.go:40-93 — NewManifestFile(...).AddedFiles(3)... —
    length 7989, spec id 0, 3 added files, 237993 added rows, one
    partition summary with the golden bounds."""
    return ManifestFile(
        manifest_path=GOLDEN_LIST_PATH,
        manifest_length=7989,
        partition_spec_id=0,
        content=content,
        sequence_number=seq,
        min_sequence_number=seq,
        added_snapshot_id=SNAPSHOT_ID,
        added_files_count=3,
        existing_files_count=0,
        deleted_files_count=0,
        added_rows_count=ADDED_ROWS,
        existing_rows_count=0,
        deleted_rows_count=0,
        partitions=[GOLDEN_SUMMARY],
        first_row_id=first_row_id,
    )


def _assert_golden_list_row(got, content, seq):
    """TestReadManifestListV2/V3 (manifest_test.go:704-782)."""
    assert got.manifest_path == GOLDEN_LIST_PATH
    assert got.manifest_length == 7989
    assert got.content == content
    assert got.sequence_number == seq
    assert got.min_sequence_number == seq
    assert got.added_snapshot_id == SNAPSHOT_ID
    assert got.added_files_count == 3
    assert got.has_added_files() is True
    assert got.existing_files_count == 0
    assert got.has_existing_files() is False
    assert got.deleted_files_count == 0
    assert got.added_rows_count == ADDED_ROWS
    assert got.existing_rows_count == 0
    assert got.deleted_rows_count == 0
    assert got.key_metadata is None
    assert got.partition_spec_id == 0
    part = got.partitions[0]
    assert part.contains_null is True
    assert part.contains_nan is False
    assert part.lower_bound == b"\x01\x00\x00\x00"
    assert part.upper_bound == b"\x02\x00\x00\x00"


def test_manifest_list_v2_golden(tmp_path):
    path = str(tmp_path / "golden-list-v2.avro")
    write_manifest_list(
        path,
        [_golden_manifest_file(ManifestContent.DELETES, 3)],
        format_version=2,
        snapshot_id=SNAPSHOT_ID,
    )
    lst = read_manifest_list(path)
    assert len(lst) == 1
    _assert_golden_list_row(lst[0], ManifestContent.DELETES, 3)


def test_manifest_list_v3_golden(tmp_path):
    """V3 list (manifest_test.go:75-93, TestReadManifestListV3): DATA
    content at sequence 5, written with first_row_id — the explicit id
    on the row must be PRESERVED, not reassigned."""
    path = str(tmp_path / "golden-list-v3.avro")
    consumed = write_manifest_list(
        path,
        [_golden_manifest_file(ManifestContent.DATA, 5, first_row_id=1000)],
        format_version=3,
        first_row_id=1000,
        snapshot_id=SNAPSHOT_ID,
        sequence_number=5,
    )
    assert consumed == 0  # the row carried its id; nothing was assigned
    lst = read_manifest_list(path)
    assert len(lst) == 1
    _assert_golden_list_row(lst[0], ManifestContent.DATA, 5)
    assert lst[0].first_row_id == 1000


# --------------------------------------------- foreign v1 files (read side)

def test_reads_foreign_v1_manifest_entries(tmp_path):
    """A v1 manifest written by an old engine (schema transcribed from
    internal/avro_schemas.go manifest_entry_v1: required snapshot_id, NO
    content/sequence fields, extra required block_size_in_bytes) must
    read back with v2 defaults — exactly the reference's
    TestManifestEntriesV1 semantics: content reads as DATA (the field
    does not exist in v1, manifest_test.go:101-104), sequence numbers
    inherit from the manifest, block size is ignored."""
    import copy

    from iceberg_go_distributed_spark.iceberg import avro as avro_io
    from iceberg_go_distributed_spark.iceberg.manifest import (
        _entry_to_avro,
        manifest_entry_schema,
    )

    sch = copy.deepcopy(manifest_entry_schema(TAXIS_SPEC, TAXIS_SCHEMA))
    sch["fields"] = [
        f for f in sch["fields"]
        if f["name"] not in ("sequence_number", "file_sequence_number")
    ]
    snap_f = next(f for f in sch["fields"] if f["name"] == "snapshot_id")
    snap_f["type"] = "long"  # required in v1
    snap_f.pop("default", None)
    df_sch = next(f for f in sch["fields"] if f["name"] == "data_file")["type"]
    df_sch["fields"] = [f for f in df_sch["fields"] if f["name"] != "content"]
    fsz_idx = next(
        i for i, f in enumerate(df_sch["fields"])
        if f["name"] == "file_size_in_bytes"
    )
    df_sch["fields"].insert(
        fsz_idx + 1,
        {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
    )

    recs = []
    for want, df_kwargs in ((DATA0, DATA0), (DATA1, DATA1)):
        e = ManifestEntry(
            ManifestEntryStatus.ADDED, ENTRY_SNAPSHOT_ID, None, None,
            DataFile(**df_kwargs),
        )
        r = _entry_to_avro(e, TAXIS_SPEC)
        # the reference's v1 fixture carries a BOGUS content value that
        # must NOT survive (the v1 schema has no content field)
        r["data_file"]["content"] = int(DataFileContent.EQUALITY_DELETES)
        r["data_file"]["block_size_in_bytes"] = 67108864
        recs.append(r)
    path = str(tmp_path / "v1-m0.avro")
    avro_io.write_ocf(path, sch, recs, metadata={"format-version": "1"})

    entries = read_manifest(path, inherit_sequence_number=7)
    assert len(entries) == 2
    for got, want in zip(entries, (DATA0, DATA1)):
        assert got.status == ManifestEntryStatus.ADDED
        assert got.snapshot_id == ENTRY_SNAPSHOT_ID
        assert got.sequence_number == 7  # inherited; v1 has no field
        _assert_golden_file(got.data_file, want)  # content == DATA


def test_reads_foreign_v1_manifest_list_null_counts(tmp_path):
    """A v1 manifest list (nullable count fields, no content/sequence —
    internal/avro_schemas.go manifest_list_file_v1) with NULL counts
    reads as the reference's 'unknown' sentinel: counts -1,
    has_added_files() conservative-TRUE (manifest.go:188-191,288)."""
    import copy

    from iceberg_go_distributed_spark.iceberg import avro as avro_io
    from iceberg_go_distributed_spark.iceberg.manifest import (
        MANIFEST_LIST_V2_SCHEMA,
    )

    sch = copy.deepcopy(MANIFEST_LIST_V2_SCHEMA)
    sch["fields"] = [
        f for f in sch["fields"]
        if f["name"] not in ("content", "sequence_number", "min_sequence_number")
    ]
    for f in sch["fields"]:
        if f["name"].endswith("_count"):
            f["type"] = ["null", f["type"]]
            f["default"] = None
    rec = {
        "manifest_path": GOLDEN_LIST_PATH,
        "manifest_length": 7989,
        "partition_spec_id": 0,
        "added_snapshot_id": SNAPSHOT_ID,
        "added_files_count": None,
        "existing_files_count": None,
        "deleted_files_count": None,
        "partitions": [GOLDEN_SUMMARY.to_avro()],
        "added_rows_count": ADDED_ROWS,
        "existing_rows_count": None,
        "deleted_rows_count": None,
        "key_metadata": None,
    }
    path = str(tmp_path / "v1-list.avro")
    avro_io.write_ocf(path, sch, [rec], metadata={"format-version": "1"})

    lst = read_manifest_list(path)
    assert len(lst) == 1
    got = lst[0]
    assert got.content == ManifestContent.DATA      # absent field default
    assert got.sequence_number == 0 and got.min_sequence_number == 0
    assert got.added_files_count == -1              # unknown sentinel
    assert got.has_added_files() is True            # nil => conservative
    assert got.existing_files_count == -1
    assert got.added_rows_count == ADDED_ROWS
    part = got.partitions[0]
    assert part.contains_null is True and part.contains_nan is False
    assert part.lower_bound == b"\x01\x00\x00\x00"
