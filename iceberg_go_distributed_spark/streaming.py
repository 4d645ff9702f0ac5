"""Structured Streaming integration.

The reference's "Append Stream" feature (README table) is a batched
record-reader append (table/table.go:123-130) — its Spark-native
equivalent is a `foreachBatch` sink committing each micro-batch through
the distributed-snapshot append, which is exactly what `append_stream`
does. Each micro-batch becomes one snapshot: exactly-once end-to-end
when the checkpoint survives, at-least-once otherwise (idempotent
readers can dedup on the batch-id property we stamp on the snapshot).

`windowed_event_counts` shows the watermark + windowed-agg shape for
late data over the `events` stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_stream(
    table,
    stream_df: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Sink a streaming DataFrame into an Iceberg table: one snapshot
    per micro-batch, committed by the driver (coordinator) after the
    executors (workers) wrote the batch's files."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()  # tolerate concurrent committers between batches
        table.append(
            batch_df, snapshot_properties={"spark.streaming.batch-id": str(batch_id)}
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the standard
    late-data-tolerant rollup (drops events later than the watermark)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
