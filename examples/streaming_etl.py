"""Table-to-table streaming ETL — an Iceberg table as BOTH ends of a
Structured Streaming query.

The medallion-pipeline shape: a raw (bronze) table receives appends
from upstream; this job streams those appends through a transformation
and commits each micro-batch to a curated (silver) table as one
snapshot. Offsets are the source's snapshot ids, durable in the query
checkpoint, so the pipeline resumes exactly where it stopped across
restarts; the sink's one-snapshot-per-batch commits carry the batch id
in the snapshot summary, letting replays be detected downstream.

Cost shape at 100 TB: each trigger plans ONLY the appended files of the
new snapshots (incremental append scan), executors read only those
files, and the transform + fanout write run on the batch, never the
table. Idle triggers are metadata-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_etl(
    spark,
    warehouse: str,
    source: str,
    dest_table,
    transform,
    checkpoint_dir: str,
):
    """One availableNow pass: stream `source`'s new snapshots through
    `transform(df) -> df` into `dest_table`. Returns after the backlog
    drains; call again on a schedule (or swap the trigger for
    processingTime in a long-running job)."""
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        if out.isEmpty():
            return
        dest_table.refresh()
        dest_table.append(
            out, snapshot_properties={"spark.streaming.batch-id": str(batch_id)}
        )

    q = (
        iceberg_stream(spark, warehouse, source)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
