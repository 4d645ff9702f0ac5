"""Write-path tuning: rolling file writer + declarative sort orders."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.metadata import SortField, SortOrder
from iceberg_go_distributed_spark.iceberg.manifest import read_manifest

from tests.test_table_e2e import LINEITEM_SCHEMA


@pytest.fixture()
def lineitem_df(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem")


def test_rolling_writer_splits_at_target(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.li_roll", LINEITEM_SCHEMA)
    tx = t.transaction()
    tx.set_properties({"write.target-file-size-bytes": "16384"})  # 16 KiB
    tx.commit()
    t.append(lineitem_df.coalesce(1))  # one task → rolling must split
    snap = t.current_snapshot()
    files = [
        e.data_file
        for m in snap.manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert len(files) > 1, "expected the rolling writer to split the stream"
    assert t.scan().to_df(spark).count() == lineitem_df.count()
    # every file but the last of each task should be >= target
    assert sum(f.record_count for f in files) == lineitem_df.count()


def test_sort_order_applied_and_recorded(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    order = SortOrder(1, (SortField(source_id=1, direction="asc"),))  # l_orderkey
    t = cat.create_table("db.li_sorted", LINEITEM_SCHEMA)
    # install the sort order
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AddSortOrderUpdate,
        AssertTableUUID,
        SetDefaultSortOrder,
    )

    tx = t.transaction()
    tx.apply(
        [AddSortOrderUpdate(order), SetDefaultSortOrder(1)],
        [AssertTableUUID(t.metadata.table_uuid)],
    )
    tx.commit()
    t.append(lineitem_df.limit(500).coalesce(1))
    files = [
        e.data_file
        for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert all(f.sort_order_id == 1 for f in files)
    # rows in the file really are sorted by l_orderkey
    import pyarrow.parquet as pq

    keys = pq.read_table(files[0].file_path, columns=["l_orderkey"])["l_orderkey"].to_pylist()
    assert keys == sorted(keys)


def test_scan_to_arrow(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.li_arrow", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(50).coalesce(1))
    tbl = t.scan().select("l_orderkey", "l_quantity").to_arrow(spark)
    assert tbl.num_rows == 50
    assert tbl.column_names == ["l_orderkey", "l_quantity"]
    assert t.scan().count(spark) == 50


def test_bucket_date_partitioned_write(tmp_path, spark):
    """Fanout write partitioned by bucket(N, date_col): Spark hands the
    pandas_udf object-dtype datetime.date values, which must hash as
    epoch *days* (not micros) to match the driver-side pure-Python
    transform — ref transforms.go:249-283."""
    from datetime import date

    from iceberg_go_distributed_spark.iceberg import types as ty
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
    from iceberg_go_distributed_spark.iceberg.transforms import BucketTransform
    from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

    schema = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "d", ty.DateType()),
    )
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spec = spec_from(schema, ("d", "bucket[4]"))
    t = cat.create_table("db.date_bucket", schema, spec=spec)
    rows = [(i, date(2017, 11, (i % 28) + 1)) for i in range(200)] + [(999, None)]
    df = spark.createDataFrame(rows, "id long, d date")
    t.append(df)

    # manifest partition values must match the scalar transform exactly
    bt = BucketTransform(4)
    files = [
        e.data_file
        for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert files
    seen = set()
    for f in files:
        seen.add(f.partition["d_bucket"])
    want = {bt.apply(d, ty.DateType()) for _, d in rows}
    assert seen == want  # includes the None bucket
    assert t.scan().to_df(spark).count() == len(rows)


def test_partition_summaries_in_snapshot(tmp_path, spark, lineitem_df):
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spec = spec_from(LINEITEM_SCHEMA, ("l_returnflag", "identity"))
    t = cat.create_table("db.li_psum", LINEITEM_SCHEMA, spec=spec)
    tx = t.transaction()
    tx.set_properties({"write.summary.partition-limit": "10"})
    tx.commit()
    t.append(lineitem_df.limit(1000))
    props = t.current_snapshot().summary.properties
    assert int(props["changed-partition-count"]) >= 2
    part_keys = [k for k in props if k.startswith("partitions.")]
    assert part_keys and all("added-records=" in props[k] for k in part_keys)

    # limit 0 (default) suppresses per-partition entries
    t2 = cat.create_table("db.li_psum2", LINEITEM_SCHEMA, spec=spec)
    t2.append(lineitem_df.limit(1000))
    props2 = t2.current_snapshot().summary.properties
    assert not [k for k in props2 if k.startswith("partitions.")]
    assert "changed-partition-count" in props2
