"""Incremental view maintenance — keeping a per-key rollup current from
the CDC changelog instead of recomputing it.

The pattern: a 100 TB fact table gets appended and row-level-deleted all
day; a dashboard needs `GROUP BY key` counts and sums.  Recomputing the
aggregate costs a full table scan per refresh.  Because count/sum are
distributive, the changelog is enough: each poll's delta is

    +agg(inserted rows)  −  agg(deleted rows)

aggregated down to |changed keys| rows, then merged into the standing
rollup with one keyed full-outer join.  Refresh cost is therefore
O(rows changed since the last poll) + O(|rollup|) — independent of the
fact table's size.  Deletes need no row values beyond the grouped
columns: the changelog carries full before-images, so max/min (which
are not delta-maintainable) are the only aggregates this pattern cannot
keep exact.

Convergence is the invariant (pinned by tests/test_cdc_example.py):
after any sequence of appends, delete_wheres, and idle polls, the
maintained rollup equals the from-scratch `GROUP BY` of the live table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_go_distributed_spark.streaming import changelog_poll


def rollup_delta(changes: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """One poll's aggregate delta: signed count and sum per key.
    O(changed rows) in, |changed keys| rows out (map-side combined)."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    return (
        changes.select(*keys, sign.alias("_s"), F.col(value_col).alias("_v"))
        .groupBy(*keys)
        .agg(
            F.sum("_s").alias("d_n"),
            F.sum(F.col("_s") * F.col("_v")).alias("d_sum"),
        )
    )


def merge_rollup(
    rollup: Optional[DataFrame], delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a delta into the standing rollup: full-outer join on the
    keys, coalesce-and-add, drop keys whose count reaches zero.  The
    join is |rollup| × |changed keys| — broadcast the delta side when
    it is small (it usually is: one poll's worth of keys)."""
    if rollup is None:
        return (
            delta.where(F.col("d_n") > 0)
            .select(*keys, F.col("d_n").alias("n"), F.col("d_sum").alias("total"))
        )
    z = F.lit(0)
    merged = rollup.join(delta, list(keys), "full_outer").select(
        *keys,
        (F.coalesce(F.col("n"), z) + F.coalesce(F.col("d_n"), z)).alias("n"),
        (F.coalesce(F.col("total"), F.lit(0.0)) + F.coalesce(F.col("d_sum"), F.lit(0.0))).alias(
            "total"
        ),
    )
    return merged.where(F.col("n") > 0)


def maintain(
    table,
    spark: SparkSession,
    ticks,
    keys: Sequence[str],
    value_col: str,
    cursor=None,
    rollup: Optional[DataFrame] = None,
):
    """Run the maintenance loop for the given schedule ``ticks``.
    Returns (rollup, cursor) for the caller to persist between runs;
    in production, materialize the rollup each tick (e.g. overwrite a
    small Iceberg table) so the next run starts from storage, keeping
    the lineage flat."""
    for _ in ticks:
        changes, cursor = changelog_poll(table, spark, cursor)
        if changes is not None:
            delta = rollup_delta(changes, keys, value_col)
            rollup = merge_rollup(rollup, delta, keys)
            # truncate lineage the way a real job's materialization
            # would — without this, N polls stack N joins into one plan
            rollup = rollup.localCheckpoint(eager=True)
    return rollup, cursor
