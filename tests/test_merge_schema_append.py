"""append(df, merge_schema=True): schema-union convenience on the write
path — add new optional columns, promote on legal widenings, cast the
data up on narrowings, null-fill missing columns, refuse incompatibles
before any metadata commit."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import (
    DoubleType,
    IntegerType,
    LongType,
    NestedField,
    Schema,
    StringType,
    schema_from_spark,
)


@pytest.fixture()
def cat(tmp_path):
    return FileSystemCatalog(str(tmp_path / "wh"))


def _table(cat, *fields):
    return cat.create_table("db.ms", Schema.of(0, *fields))


def test_merge_schema_adds_new_column_and_null_fills_old_rows(cat, spark):
    t = _table(
        cat,
        NestedField(1, "id", LongType(), required=True),
        NestedField(2, "v", DoubleType()),
    )
    t.append(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1))
    t.append(
        spark.createDataFrame(
            [(2, 2.0, "x")], "id long, v double, tag string"
        ).coalesce(1),
        merge_schema=True,
    )
    rows = sorted(
        (r.id, r.v, r.tag) for r in t.scan().to_df(spark).collect()
    )
    assert rows == [(1, 1.0, None), (2, 2.0, "x")]
    assert t.metadata.current_schema().find_field("tag") is not None


def test_merge_schema_null_fills_missing_incoming_column(cat, spark):
    t = _table(
        cat,
        NestedField(1, "id", LongType(), required=False),
        NestedField(2, "v", DoubleType()),
    )
    t.append(
        spark.createDataFrame([(5,)], "id long").coalesce(1), merge_schema=True
    )
    [row] = t.scan().to_df(spark).collect()
    assert (row.id, row.v) == (5, None)


def test_merge_schema_promotes_int_to_long(cat, spark):
    t = _table(cat, NestedField(1, "n", IntegerType()))
    t.append(spark.createDataFrame([(1,)], "n int").coalesce(1))
    t.append(
        spark.createDataFrame([(1 << 40,)], "n long").coalesce(1),
        merge_schema=True,
    )
    assert isinstance(
        t.metadata.current_schema().find_field("n").field_type, LongType
    )
    assert sorted(r.n for r in t.scan().to_df(spark).collect()) == [1, 1 << 40]


def test_merge_schema_casts_narrower_data_up_without_metadata_change(cat, spark):
    t = _table(cat, NestedField(1, "n", LongType()))
    t.append(spark.createDataFrame([(10,)], "n long").coalesce(1))
    before = t.metadata.current_schema_id
    t.append(
        spark.createDataFrame([(7,)], "n int").coalesce(1), merge_schema=True
    )
    assert t.metadata.current_schema_id == before  # no schema commit
    assert sorted(r.n for r in t.scan().to_df(spark).collect()) == [7, 10]


def test_merge_schema_refuses_incompatible_type_before_committing(cat, spark):
    t = _table(
        cat,
        NestedField(1, "n", LongType()),
        NestedField(2, "v", DoubleType()),
    )
    before = t.metadata.current_schema_id
    with pytest.raises(ValueError, match="incompatible"):
        t.append(
            spark.createDataFrame(
                [("oops", 1.0, "new")], "n string, v double, extra string"
            ).coalesce(1),
            merge_schema=True,
        )
    t.refresh()
    # validation ran BEFORE any schema commit: no column was added
    assert t.metadata.current_schema_id == before
    assert t.metadata.current_schema().find_field("extra") is None


def test_plain_append_still_requires_exact_schema(cat, spark):
    t = _table(cat, NestedField(1, "id", LongType()))
    with pytest.raises(Exception):
        t.append(
            spark.createDataFrame([(1, "x")], "id long, tag string").coalesce(1)
        )
    assert t.metadata.current_schema().find_field("tag") is None


def test_merge_schema_accepts_identical_struct_column(cat, spark):
    """Struct-typed columns compare STRUCTURALLY: the fresh field ids the
    Spark-to-Iceberg conversion assigns must not make an unchanged struct
    look like an illegal promotion."""
    df = spark.createDataFrame(
        [(1, ("x", 2))], "id long, meta struct<tag string, n long>"
    )
    t = cat.create_table("db.ms_struct", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    before = t.metadata.current_schema_id
    t.append(
        spark.createDataFrame(
            [(2, ("y", 3))], "id long, meta struct<tag string, n long>"
        ).coalesce(1),
        merge_schema=True,
    )
    assert t.metadata.current_schema_id == before  # no spurious evolution
    assert t.scan().to_df(spark).count() == 2
