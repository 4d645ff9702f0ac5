"""Exactly-once table mirroring via the first-class CDC stream.

Upgrades examples/cdc_consumer.py's scheduler-driven poll loop to
Structured Streaming: `iceberg_stream(..., mode="cdc")` delivers row
events (`_change_type` + stable v3 `_row_id` lineage), and each
micro-batch applies to the mirror table as

    delete-by-_row_id (equality deletes)  →  append inserts

keyed on the lineage column, so no row-value comparisons ever run.
Offsets are snapshot ids in the query checkpoint; a crash between
"batch applied" and "checkpoint committed" redelivers the batch, which
the apply makes IDEMPOTENT by stamping the micro-batch id on the
mirror's snapshots and skipping already-applied ids (the same
batch-id-dedup contract streaming.append_stream documents).

Cost model: per trigger, O(changed manifests) planning on the source +
reads of ONLY the changed files; the mirror apply is one equality-
delete commit (skipped when the batch carries no deletes) and one
append. Idle triggers are metadata-only. Snapshot expiry on the source
must retain the consumer horizon — the standard CDC-log contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_go_distributed_spark.streaming import iceberg_stream

BATCH_PROP = "cdc-mirror.batch-id"


def _applied_batches(mirror) -> set[int]:
    """Micro-batch ids already applied to the mirror (from snapshot
    summaries) — the idempotency ledger for redelivered batches."""
    out = set()
    for snap in mirror.metadata.snapshots:
        v = (snap.summary.properties or {}).get(BATCH_PROP)
        if v is not None:
            out.add(int(v))
    return out


def mirror_via_cdc_stream(
    spark,
    source_warehouse: str,
    source_table: str,
    mirror,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and for availableNow: drain) a streaming mirror of
    `source_table` into the `mirror` Table. The mirror's schema is the
    source's columns plus `_row_id long` (the join key for deletes and
    the provenance link back to the source row)."""

    def apply_batch(batch_df, batch_id: int) -> None:
        mirror.refresh()
        if batch_id in _applied_batches(mirror):
            return  # redelivered after a crash: already applied
        rows = batch_df.persist()
        try:
            # A batch can span several source commits, so a row may be
            # inserted AND deleted within it. Event ORDER need not be
            # replayed: `_row_id`s are never reused, so the pair simply
            # NETS OUT — the mirror never sees that row. What remains:
            # delete-only ids (rows the mirror holds) and insert-only
            # rows. Set logic, no ordering column required.
            ins = rows.where(F.col("_change_type") == "insert")
            dels = rows.where(F.col("_change_type") == "delete").select("_row_id")
            netted = ins.select("_row_id").intersect(dels)
            apply_dels = dels.join(netted, "_row_id", "left_anti")
            apply_ins = ins.join(netted, "_row_id", "left_anti").drop(
                "_change_type"
            )
            if apply_dels.limit(1).count():
                mirror.delete_by_keys(apply_dels, ["_row_id"])
            # the batch-id stamp rides the APPEND (the last commit of the
            # apply): a crash before it leaves the batch unstamped, so
            # the redelivery re-runs both halves — delete_by_keys is
            # naturally idempotent, the append never happened
            mirror.append(
                apply_ins, snapshot_properties={BATCH_PROP: str(batch_id)}
            )
        finally:
            rows.unpersist()

    writer = (
        iceberg_stream(spark, source_warehouse, source_table, mode="cdc")
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("cdc mirror drain did not finish within 300s")
    return q
