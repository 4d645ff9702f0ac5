"""examples/cdc_consumer.py: the mirror converges to the source table
through appends, deletes, and idle ticks."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_cdc_mirror_converges(tmp_path, spark):
    from cdc_consumer import consume

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        Schema,
    )

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.src",
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "x", DoubleType()),
        ),
    )
    t.upgrade_format_version(3)

    # consumer starts on the EMPTY table (the beginning-cursor path)
    mirror, cursor = consume(t, spark, range(1))
    assert mirror is None

    w = cat.load_table("db.src")
    w.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, x double").coalesce(1))
    mirror, cursor = consume(t, spark, range(2), cursor, mirror)  # incl. idle tick
    assert sorted(r.id for r in mirror.collect()) == [1, 2]

    w.append(spark.createDataFrame([(3, 3.0)], "id long, x double").coalesce(1))
    w.delete_where(spark, E.equal("id", 1))
    mirror, cursor = consume(t, spark, range(1), cursor, mirror)
    assert sorted(r.id for r in mirror.collect()) == [2, 3]

    # the mirror IS the source, row for row
    src = {(r.id, r.x) for r in t.scan().to_df(spark).collect()}
    assert {(r.id, r.x) for r in mirror.collect()} == src


def test_incremental_rollup_converges(tmp_path, spark):
    """examples/incremental_rollup.py: the maintained GROUP BY equals a
    full recompute after every poll, through appends, deletes (incl. a
    whole key disappearing), and idle ticks."""
    from incremental_rollup import maintain

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        Schema,
        StringType,
    )

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.facts",
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "k", StringType()),
            NestedField(3, "v", DoubleType()),
        ),
    )
    t.upgrade_format_version(3)

    def recompute():
        df = t.scan().to_df(spark)
        return {
            (r["k"]): (r["n"], r["total"])
            for r in df.groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
            .collect()
        }

    def as_dict(rollup):
        return {r["k"]: (r["n"], r["total"]) for r in rollup.collect()}

    from pyspark.sql import functions as F

    rollup, cursor = maintain(t, spark, range(1), ["k"], "v")  # position on empty
    assert rollup is None

    w = cat.load_table("db.facts")
    w.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 4.0)], "id long, k string, v double"
        ).coalesce(1)
    )
    rollup, cursor = maintain(t, spark, range(2), ["k"], "v", cursor, rollup)  # + idle
    assert as_dict(rollup) == recompute() == {"a": (2, 3.0), "b": (1, 4.0)}

    # delete one row of 'a', ALL of 'b' (the key must vanish), add 'c'
    w.delete_where(spark, E.equal("id", 2))
    w.delete_where(spark, E.equal("k", "b"))
    w.append(
        spark.createDataFrame([(4, "c", 8.0)], "id long, k string, v double").coalesce(1)
    )
    rollup, cursor = maintain(t, spark, range(1), ["k"], "v", cursor, rollup)
    got = as_dict(rollup)
    assert got == recompute() == {"a": (1, 1.0), "c": (1, 8.0)}
    assert "b" not in got
