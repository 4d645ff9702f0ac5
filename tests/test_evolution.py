"""Schema + spec evolution, incl. reads across schema versions via
field-id resolution (the rename-safety test is the critical one:
scanner_test.go:654-690 filter-on-added-column is also ported)."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

from tests.test_table_e2e import LINEITEM_SCHEMA


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "warehouse"))


@pytest.fixture()
def lineitem_df(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem")


def test_update_schema_builders(fs_catalog):
    s = Schema.of(
        0,
        NestedField(1, "id", ty.IntegerType(), required=True),
        NestedField(2, "name", ty.StringType()),
    )
    t = fs_catalog.create_table("db.ev", s)
    new = (
        t.update_schema()
        .add_column("score", ty.FloatType(), doc="points")
        .rename_column("name", "full_name")
        .update_column("id", field_type=ty.LongType())
        .move_first("score")
        .commit()
    )
    assert new.schema_id == 1
    assert [f.name for f in new.fields] == ["score", "id", "full_name"]
    assert isinstance(new.fields[1].field_type, ty.LongType)
    assert new.fields[0].field_id == 3  # fresh id
    assert t.metadata.current_schema_id == 1
    assert len(t.metadata.schemas) == 2
    assert t.metadata.last_column_id == 3


def test_update_schema_rejects_illegal(fs_catalog):
    s = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "name", ty.StringType()),
    )
    t = fs_catalog.create_table("db.ev2", s)
    with pytest.raises(ValueError):
        t.update_schema().add_column("id", ty.LongType())  # duplicate
    with pytest.raises(ValueError):
        t.update_schema().update_column("id", field_type=ty.IntegerType())  # narrow
    with pytest.raises(ValueError):
        t.update_schema().update_column("name", required=True)
    with pytest.raises(ValueError):
        t.update_schema().add_column("req", ty.LongType(), required=True)
    with pytest.raises(ValueError):
        t.update_schema().drop_column("nope")


def test_union_by_name(fs_catalog):
    s = Schema.of(0, NestedField(1, "id", ty.IntegerType(), required=True))
    t = fs_catalog.create_table("db.ev3", s)
    other = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "extra", ty.StringType()),
    )
    new = t.update_schema().union_by_name(other).commit()
    assert isinstance(new.fields[0].field_type, ty.LongType)  # promoted
    assert new.fields[1].name == "extra"


def test_rename_then_read_old_files(fs_catalog, spark, lineitem_df):
    """Files written before a rename must read under the new name —
    field-id resolution, not name matching."""
    t = fs_catalog.create_table("db.ev_rename", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(500).coalesce(1))
    t.update_schema().rename_column("l_quantity", "qty").commit()

    df = t.scan().to_df(spark)
    assert "qty" in df.columns and "l_quantity" not in df.columns
    # values survived the rename (old parquet has column name l_quantity)
    want = lineitem_df.limit(500).agg({"l_quantity": "sum"}).first()[0]
    got = df.agg({"qty": "sum"}).first()[0]
    assert abs(got - want) < 1e-9

    # filters bind against the new name
    n = t.scan(row_filter=E.greater_than("qty", 45.0)).to_df(spark).count()
    assert n == lineitem_df.limit(500).where("l_quantity > 45.0").count()


def test_add_column_reads_null_then_values(fs_catalog, spark, lineitem_df):
    """scanner_test.go:654-690 — filter on a column added after the
    first file was written."""
    t = fs_catalog.create_table("db.ev_add", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(100).coalesce(1))
    t.update_schema().add_column("source_tag", ty.StringType()).commit()

    from pyspark.sql import functions as F

    tagged = lineitem_df.limit(50).withColumn("source_tag", F.lit("batch2"))
    t.append(tagged.coalesce(1))

    df = t.scan().to_df(spark)
    assert df.count() == 150
    assert df.where("source_tag IS NULL").count() == 100
    assert df.where("source_tag = 'batch2'").count() == 50
    # metadata-level filter on the added column
    n = t.scan(row_filter=E.equal("source_tag", "batch2")).to_df(spark).count()
    assert n == 50


def test_drop_column_hides_values(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.ev_drop", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(100).coalesce(1))
    t.update_schema().drop_column("l_comment") if "l_comment" in [
        f.name for f in LINEITEM_SCHEMA.fields
    ] else t.update_schema().drop_column("l_linestatus").commit()
    df = t.scan().to_df(spark)
    assert "l_linestatus" not in df.columns
    assert df.count() == 100
    # time travel to the old snapshot still shows the old schema
    first = t.metadata.snapshots[0]
    old = t.scan(snapshot_id=first.snapshot_id).to_df(spark)
    assert "l_linestatus" in old.columns


def test_update_spec_evolution(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.ev_spec", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(200).coalesce(1))  # unpartitioned file

    new_spec = t.update_spec().add_field("l_returnflag", "identity").commit()
    assert new_spec.spec_id == 1
    assert t.metadata.default_spec_id == 1

    t.append(lineitem_df.limit(200))  # partitioned by the new spec
    # both specs coexist; scans handle each manifest with its own spec
    assert t.scan().to_df(spark).count() == 400
    n = t.scan(row_filter=E.equal("l_returnflag", "R")).to_df(spark).count()
    want = lineitem_df.limit(200).where("l_returnflag='R'").count() * 2
    assert n == want

    with pytest.raises(ValueError):
        t.update_spec().add_field("l_returnflag", "identity")  # duplicate
    with pytest.raises(ValueError):
        t.update_spec().remove_field("nope")

    spec3 = t.update_spec().rename_field("l_returnflag", "rf").commit()
    assert spec3.fields[0].name == "rf"


def test_rename_keeps_name_mapping_in_sync(fs_catalog, spark, tmp_path):
    """Tables with ID-less files (add_files → name mapping) must still
    resolve those files after a rename: the mapping entry keeps the old
    name and gains the new one (ref name_mapping.go:144)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_go_distributed_spark.iceberg import types as ty
    from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

    schema = Schema.of(
        1,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "payload", ty.StringType()),
    )
    t = fs_catalog.create_table("db.nm_sync", schema)
    # external file WITHOUT field ids → registered via name mapping
    ext = str(tmp_path / "ext.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "payload": ["a", "b"]}), ext
    )
    t.add_files([ext])
    assert "schema.name-mapping.default" in t.metadata.properties

    t.update_schema().rename_column("payload", "body").commit()
    nm = json.loads(t.metadata.properties["schema.name-mapping.default"])
    entry = next(m for m in nm if m.get("field-id") == 2)
    assert set(entry["names"]) == {"payload", "body"}

    # the ID-less file still reads, now under the new column name
    df = t.scan().to_df(spark)
    rows = {r.id: r.body for r in df.collect()}
    assert rows == {1: "a", 2: "b"}


def test_rename_then_delete_on_id_less_files(fs_catalog, spark, tmp_path):
    """MOR path on a name-mapping table after a rename: the grouped
    multi-name read must resolve old-named ID-less files AND apply the
    positional deletes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg import types as ty
    from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

    schema = Schema.of(
        1,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "payload", ty.StringType()),
    )
    t = fs_catalog.create_table("db.nm_mor", schema)
    ext = str(tmp_path / "ext.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array(range(10), pa.int64()), "payload": [f"p{i}" for i in range(10)]}
        ),
        ext,
    )
    t.add_files([ext])
    t.update_schema().rename_column("payload", "body").commit()
    t.delete_where(spark, E.greater_than_or_equal("id", 7))

    rows = {r.id: r.body for r in t.scan().to_df(spark).collect()}
    assert rows == {i: f"p{i}" for i in range(7)}
