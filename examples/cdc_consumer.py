"""CDC consumption loop — incrementally mirroring a v3 Iceberg table
into a downstream store with the changelog poll primitive.

The pattern a training pipeline's "watch the curated table" job runs:
a durable cursor (plain snapshot id), one poll per schedule tick,
row-level inserts/deletes applied to the mirror. Idle ticks cost one
metadata refresh — no Spark job. Snapshot expiry on the source must
retain the consumer horizon (expire_snapshots retain-last / max-age),
the standard CDC-log contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_go_distributed_spark.streaming import changelog_poll


def apply_changes(mirror: DataFrame | None, changes: DataFrame) -> DataFrame:
    """Apply one poll's changelog to a mirror frame: deletes drop by
    _row_id, inserts append. _row_id is stable for a row's whole life,
    so this is an anti-join + union — no row-value comparisons."""
    inserts = changes.where(F.col("_change_type") == "insert").drop("_change_type")
    deletes = changes.where(F.col("_change_type") == "delete").select("_row_id")
    if mirror is None:
        return inserts
    return mirror.join(deletes, "_row_id", "left_anti").unionByName(inserts)


def consume(table, spark: SparkSession, ticks, cursor=None, mirror=None):
    """Run the poll loop for the given schedule `ticks` (any iterable —
    a range for tests, a timer in production). Returns (mirror, cursor)
    so the caller can persist both between runs."""
    for _ in ticks:
        changes, cursor = changelog_poll(table, spark, cursor)
        if changes is not None:
            mirror = apply_changes(mirror, changes)
    return mirror, cursor


def catch_up(table, spark: SparkSession, cursor=None, mirror=None):
    """Long-gap catch-up: ONE range-netted diff instead of replaying
    every intermediate commit.

    A consumer resuming after days of downtime faces N commits; the
    per-commit event stream (`changelog_poll` per tick, or the CDC
    readStream) replays every intermediate version of hot rows — a row
    MERGEd 500 times since the cursor costs 500 delete+insert pairs.
    `changelog_scan(from, to)` nets the whole range on row lineage
    (`_row_id` anti-joins of exactly TWO table states), so each surviving
    row costs one insert and each vanished row one delete, independent
    of how many times it churned in between. Returns (mirror, cursor at
    head); switch back to `consume`/the CDC stream from there.

    Use this when (head − cursor) spans many commits or any bulk MERGE
    the per-commit expansion refuses (`read.cdc.eq-keys-max-rows`);
    per-commit streaming remains right for low-lag event consumers that
    need every intermediate version.

    First-class equivalent (r11): the CDC readStream now does this
    switch itself — pass `cdc_catch_up_snapshots=N` (or set table
    property `read.cdc.catch-up-snapshots`) and a batch spanning more
    than N commits plans ONE range-netted diff instead of per-commit
    events; `cdc_net=true` nets every batch. This recipe remains the
    changelog_poll-level version of the same idea."""
    head = table.current_snapshot()
    if head is None or head.snapshot_id == cursor:
        return mirror, cursor
    changes = table.changelog_scan(spark, cursor, head.snapshot_id)
    return apply_changes(mirror, changes), head.snapshot_id
