"""examples/streaming_etl.py: bronze→silver streaming pipeline over two
Iceberg tables — incremental, restartable, transform applied per batch."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_streaming_etl_bronze_to_silver(tmp_path, spark):
    from streaming_etl import run_etl

    from pyspark.sql import functions as F

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    raw = spark.createDataFrame(
        [(1, "ok", 10.0), (2, "drop", -1.0), (3, "ok", 30.0)],
        "id long, status string, v double",
    )
    bronze = cat.create_table("db.bronze", schema_from_spark(raw.schema))
    silver_schema = spark.createDataFrame([(1, 20.0)], "id long, v2 double").schema
    silver = cat.create_table("db.silver", schema_from_spark(silver_schema))

    def transform(df):
        return df.where("status = 'ok'").select("id", (F.col("v") * 2).alias("v2"))

    ck = str(tmp_path / "ck")
    bronze.append(raw.coalesce(1))
    run_etl(spark, wh, "db.bronze", silver, transform, ck)
    assert sorted(tuple(r) for r in silver.scan().to_df(spark).collect()) == [
        (1, 20.0), (3, 60.0),
    ]

    # incremental: only the new snapshot flows on the next pass
    bronze.append(
        spark.createDataFrame(
            [(4, "ok", 40.0), (5, "drop", 0.0)], "id long, status string, v double"
        ).coalesce(1)
    )
    run_etl(spark, wh, "db.bronze", silver, transform, ck)
    got = sorted(tuple(r) for r in silver.scan().to_df(spark).collect())
    assert got == [(1, 20.0), (3, 60.0), (4, 80.0)]

    # idle pass: no new snapshots → no new silver snapshot
    n_snaps = len(silver.metadata.snapshots)
    run_etl(spark, wh, "db.bronze", silver, transform, ck)
    assert len(silver.refresh().metadata.snapshots) == n_snaps

    # batch ids stamped for downstream replay detection
    assert any(
        "spark.streaming.batch-id" in s.summary.properties
        for s in silver.metadata.snapshots
    )
