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
(e.g. raw float64 sensor noise), pre-bin with ``value_histogram``'s
``bin`` expression (or round to the precision you actually need) before
calling; the result is then the exact quantile of the binned series.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group discrete quantiles (type-1: smallest value whose
    cumulative count reaches ceil(q*n)).

    Output columns: ``*group_cols, q (double), quantile_value``.

    Shape: groupBy(group, value) count — map-side combined, so the
    shuffle carries distinct values, not rows — then two windows over
    the compressed frame (cumulative count ordered by value, and the
    per-group total), then a generate of the q-list and a filter that
    keeps exactly one row per (group, q).  Nothing is collected; the
    result is |groups| × |qs| rows.
    """
    gcols = [F.col(c) for c in group_cols]
    counts = df.groupBy(*gcols, F.col(value_col)).agg(F.count("*").alias("_c"))
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
