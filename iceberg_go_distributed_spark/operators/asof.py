"""As-of and range (interval) joins — time-series operators Spark lacks
as built-ins, expressed as compositions of native DataFrame ops so the
whole plan stays JVM-side (no Python in the hot path).

Scale notes (the 100 TB lens):
  - `asof_join` is the union-then-window formulation: both inputs
    shuffle ONCE on the join key, the per-key ordered carry-forward is a
    single running `last(..., ignorenulls)` window — no range-condition
    join (which Spark executes as a broadcast-nested-loop or an
    O(n·m) sort-merge over the inequality), no per-key driver loop.
    Equivalent to the merge phase of a sort-merge as-of join
    (pandas.merge_asof / QuestDB / kdb aj), but distributed: each key
    group sorts locally within its shuffle partition.
  - `range_join_count` bins both sides to fixed-width time buckets and
    joins on (key, bucket) with the probe side exploded to the three
    adjacent buckets, then filters the exact interval predicate. The
    equi-join prunes candidates to O(events per 3 buckets); Catalyst
    runs it as a plain shuffled hash join. This is the standard
    "bucketed range join" rewrite (DuckDB does the same internally for
    its range joins).
  - Skew: a hot key serializes its window evaluation (as-of order is
    inherently sequential per key); AQE splits oversized shuffle
    partitions across keys, and the carry-forward state is O(1) per
    row, so a hot key costs time, never memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance_us: int | None = None,
    tie_break: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the most recent right row with
    ``right_ts <= left_ts`` (``direction='backward'``, inclusive —
    DuckDB ``ASOF JOIN`` / ``pandas.merge_asof(direction='backward')``)
    or the earliest right row with ``right_ts >= left_ts``
    (``direction='forward'``) on the same key.

    Timestamps are compared as microseconds-since-epoch. Matched right
    columns come back as ``<col>`` from `right_cols` (``<col><suffix>``
    when the name collides with a left column), plus ``_asof_gap_us``
    (|left ts − matched ts|, null when no match). With `tolerance_us`,
    matches farther than the tolerance are nulled out (LEFT semantics —
    left rows are never dropped).

    `tie_break`: column name on the right used to order equal-timestamp
    right rows (the LAST one in (ts, tie_break) order wins), making the
    pick deterministic when timestamps collide.

    Internal columns use a ``__asof_`` prefix so user columns cannot
    collide with the machinery.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1
    keys = [on] if isinstance(on, str) else list(on)
    # SQL equality semantics: a NULL key matches nothing. The window
    # partitioner would group null keys together, so null-keyed right
    # rows are dropped up front (they can never match), which leaves
    # null-keyed left partitions payload-free — their rows come out
    # unmatched, exactly as DuckDB ASOF / merge_asof behave.
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    # a null right timestamp can never satisfy the as-of inequality
    # (SQL: ts <= x is NULL, not true) — drop it up front; otherwise it
    # sorts NULLS FIRST in the window and its payload leaks into
    # null-ts left rows. Null-ts LEFT rows order before every real
    # right row and come out unmatched, the SQL-consistent result.
    right = right.where(F.col(right_ts).isNotNull())
    payload = F.struct(
        F.unix_micros(F.col(right_ts)).alias("__asof_ats"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *keys,
        (F.unix_micros(F.col(right_ts)) * sign).alias("__asof_us"),
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_p"),
        *(
            [F.col(tie_break).alias("__asof_tie")]
            if tie_break is not None
            else [F.lit(0).alias("__asof_tie")]
        ),
    )
    l = left.select(
        "*",
        (F.unix_micros(F.col(left_ts)) * sign).alias("__asof_us"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(r.schema["__asof_p"].dataType).alias("__asof_p"),
        F.lit(None).cast(r.schema["__asof_tie"].dataType).alias("__asof_tie"),
    )
    # right rows order BEFORE left rows at equal ts (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — inclusive.
    # direction='forward' negates the ordering timestamp, turning
    # "latest at-or-before" into "earliest at-or-after".
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_us", "__asof_side", "__asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__asof_m", F.last("__asof_p", ignorenulls=True).over(w)
    ).where(F.col("__asof_side") == 1)
    gap = (F.col("__asof_us") * sign - F.col("__asof_m.__asof_ats")) * sign
    if tolerance_us is not None:
        carried = carried.withColumn(
            "__asof_m", F.when(gap <= F.lit(tolerance_us), F.col("__asof_m"))
        )
        gap = (F.col("__asof_us") * sign - F.col("__asof_m.__asof_ats")) * sign
    taken = set(left.columns)
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_m.{c}").alias(c + suffix if c in taken else c)
        for c in right_cols
    ]
    return carried.select(*out_cols, gap.cast("long").alias("_asof_gap_us"))


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    radius_us: int = 300_000_000,
    probe_id: str = "event_id",
    build_id: str = "event_id",
) -> DataFrame:
    """For each probe row, count build rows on the same key within
    ±radius of its timestamp (excluding the probe row itself when ids
    collide). Returns the probe's key/id columns plus ``n_nearby``.

    The interval predicate is rewritten to an equi-join on
    (key, time bucket) with the probe side exploded to its three
    adjacent radius-width buckets — any row within ±radius lands in one
    of them, and each build row matches at most one probe bucket, so the
    exact filter afterwards never double-counts.
    """
    keys = [on] if isinstance(on, str) else list(on)
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / F.lit(radius_us))  # noqa: E731
    p = probe.select(
        *keys,
        F.col(probe_id).alias("_pid"),
        F.unix_micros(F.col(probe_ts)).alias("_pus"),
        F.explode(
            F.array(bucket(probe_ts) - 1, bucket(probe_ts), bucket(probe_ts) + 1)
        ).alias("_bkt"),
    )
    b = build.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        F.col(build_id).alias("_bid"),
        F.unix_micros(F.col(build_ts)).alias("_bus"),
        bucket(build_ts).alias("_bkt"),
    )
    # LEFT join so probes with zero neighbours still produce a row; the
    # exact interval predicate lives in the conditional sum (a WHERE here
    # could drop every row of a probe and lose its n_nearby=0 group)
    joined = p.join(
        b,
        [p["_bkt"] == b["_bkt"]] + [p[k] == b[f"_bk_{k}"] for k in keys],
        "left",
    )
    near = F.when(
        F.col("_bid").isNotNull()
        & (F.abs(F.col("_bus") - F.col("_pus")) <= F.lit(radius_us))
        & (F.col("_bid") != F.col("_pid")),
        1,
    ).otherwise(0)
    return (
        joined.groupBy(*keys, "_pid")
        .agg(F.sum(near).cast("long").alias("n_nearby"))
        .withColumnRenamed("_pid", probe_id)
    )
