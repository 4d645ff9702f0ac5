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
