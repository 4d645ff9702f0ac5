"""Structured Streaming → Iceberg table sink (foreachBatch append) +
watermarked windowed aggregation."""

from __future__ import annotations

import os

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
from iceberg_go_distributed_spark.streaming import append_stream, windowed_event_counts


def test_append_stream_sink(tmp_path, spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    events = load_table(spark, sf_dir, "events").limit(1000)
    src_dir = str(tmp_path / "src")
    events.coalesce(2).write.parquet(src_dir)

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.events_sink", schema_from_spark(events.schema))

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = append_stream(t, stream, checkpoint_dir=str(tmp_path / "cp"))
    q.awaitTermination(120)

    t.refresh()
    assert t.current_snapshot() is not None
    got = t.scan().to_df(spark).count()
    assert got == events.count()
    # batch id stamped on the snapshot for idempotent consumers
    assert "spark.streaming.batch-id" in t.current_snapshot().summary.properties


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    """The streaming aggregation expressed on a batch frame must agree
    with a direct groupBy (same logical plan semantics)."""
    from iceberg_go_distributed_spark.datasets import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    rolled = windowed_event_counts(events)  # watermark is a no-op on batch
    direct = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    assert rolled.agg(F.sum("n")).first()[0] == events.count()
    assert rolled.count() == direct.count()
