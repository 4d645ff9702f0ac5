"""Distribution statistics: exact distributed quantiles and fixed-width
histograms.

Exact quantiles on a cluster are usually mis-specified as "sort
everything" (single-reducer-per-group) or silently approximated
(approx_percentile).  ``exact_quantiles`` takes the third path: compress
to per-group *distinct-value counts* first (one hash aggregate with
map-side combine), then run the cumulative-count window over the
compressed frame.  For real-world measure columns (latencies, prices,
scores) the distinct-value cardinality is orders of magnitude below the
row count, so the window input is small even at 100 TB of rows; the
quantile itself is the classic type-1 (discrete) order statistic
k = ceil(q*n), which is integer-exact and reproduces bit-for-bit across
engines — no interpolation-formula drift.

When the value column is continuous enough that distinct values ≈ rows
(e.g. raw float64 sensor noise), the compression buys nothing and the
per-group window degrades to a single sorted task.  ``exact_quantiles``
guards this mechanically: it estimates the post-compression row count
with one cheap ``approx_count_distinct`` aggregate and, above
``max_window_rows``, either pre-rounds to the caller-stated
``precision`` (the result is then the exact quantile of the rounded
series) or raises with the pre-bin recipe — the degradation can no
longer happen silently.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ContinuousValueError(ValueError):
    """The value column compresses too little for an exact windowed
    quantile; the caller must state the precision they actually need."""


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    precision: Optional[int] = None,
    max_window_rows: int = 2_000_000,
) -> DataFrame:
    """Exact per-group discrete quantiles (type-1: smallest value whose
    cumulative count reaches ceil(q*n)) over the NON-NULL values of
    ``value_col`` (SQL semantics: like percentile functions, nulls are
    excluded from both the ranking and the count).

    Output columns: ``*group_cols, q (double), quantile_value``.

    Shape: groupBy(group, value) count — map-side combined, so the
    shuffle carries distinct values, not rows — then two windows over
    the compressed frame (cumulative count ordered by value, and the
    per-group total), then a generate of the q-list and a filter that
    keeps exactly one row per (group, q).  Nothing is collected but the
    O(1) guard estimate; the result is |groups| × |qs| rows.

    Guard: if the estimated distinct-value count exceeds
    ``max_window_rows`` (i.e. the column is effectively continuous and
    the compression cannot bound the window input), the values are
    pre-rounded to ``precision`` decimal digits when given, else a
    :class:`ContinuousValueError` explains the pre-bin recipe.  The
    absolute count is the right trigger — a 17k-distinct window is fine
    regardless of the input row count, a 10^9-distinct one is not.
    """
    vals = df.where(F.col(value_col).isNotNull())
    est = vals.agg(
        F.approx_count_distinct(value_col).alias("d"), F.count("*").alias("n")
    ).first()
    if est["d"] > max_window_rows:
        if precision is None:
            raise ContinuousValueError(
                f"{value_col} has ~{est['d']:,} distinct values over "
                f"{est['n']:,} rows; the distinct-value compression cannot "
                f"bound the quantile window below max_window_rows="
                f"{max_window_rows:,}. Pass precision=<decimal digits> to "
                "compute exact quantiles of the rounded series, or pre-bin "
                "with value_histogram's floor(value/width) expression."
            )
        vals = vals.withColumn(value_col, F.round(F.col(value_col), precision))
    elif precision is not None:
        vals = vals.withColumn(value_col, F.round(F.col(value_col), precision))
    gcols = [F.col(c) for c in group_cols]
    counts = vals.groupBy(*gcols, F.col(value_col)).agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = counts.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    qlist = F.array(*[F.lit(float(q)) for q in qs])
    k = F.ceil(F.col("q") * F.col("_n"))
    return (
        cum.select(*gcols, F.col(value_col), "_c", "_cum", "_n")
        .withColumn("q", F.explode(qlist))
        .where((F.col("_cum") >= k) & (F.col("_cum") - F.col("_c") < k))
        .select(*gcols, "q", F.col(value_col).alias("quantile_value"))
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    bin_width: float,
) -> DataFrame:
    """Fixed-width histogram: per-group counts of floor(value/width)
    bins.  One map-side-combined aggregate; embarrassingly scale-safe
    (the shuffle carries |groups| × |occupied bins| rows).

    Output columns: ``*group_cols, bin (bigint), bin_lo (double), n``.
    """
    gcols = [F.col(c) for c in group_cols]
    bin_col = F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("bigint")
    return (
        df.select(*gcols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.col("bin").cast("double") * F.lit(float(bin_width)))
        .select(*group_cols, "bin", "bin_lo", "n")
    )
