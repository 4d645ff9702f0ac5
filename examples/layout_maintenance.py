"""Layout maintenance: detect clustering drift, recluster, verify.

A steady append stream erodes any clustered layout: each new file spans
~the whole key range again, file bounds overlap more and more, and the
selective filters that used to plan a handful of files fall back to
scanning everything. This example encodes the production policy loop a
table owner schedules alongside compaction:

  1. MEASURE drift as the mean number of OTHER files whose sort-key
     interval overlaps each file's (0.0 = perfectly disjoint layout) —
     driver-side O(files log files) over manifest bounds, no Spark job;
  2. RECLUSTER with `rewrite_data_files(strategy="sort"|"zorder")` when
     drift crosses the threshold;
  3. the caller verifies payoff the same way every scan does: plan a
     probe filter and count files.

At 100 TB the check itself stays metadata-only (bounds ride in the
manifests the planner already reads), so the policy can run on every
maintenance tick; only the rewrite — the expensive part — is gated.
"""

from __future__ import annotations

import heapq

from iceberg_go_distributed_spark.iceberg.conversions import from_bytes


def clustering_drift(table, col: str) -> float:
    """Mean overlap count per file on `col`'s manifest bounds: for each
    data file, how many OTHER files' [lower, upper] intervals intersect
    its own. 0.0 means disjoint (perfectly clustered); n-1 means every
    file overlaps every other (the unclustered worst case). Files
    without bounds for the column are skipped (all-null or reduced
    metrics) — they cannot prune anyway."""
    schema = table.metadata.current_schema()
    f = schema.find_field(col)
    if f is None:
        raise ValueError(f"unknown column {col!r}")
    bounds = []
    for task in table.scan().plan_files():
        lb = (task.file.lower_bounds or {}).get(f.field_id)
        ub = (task.file.upper_bounds or {}).get(f.field_id)
        if lb is not None and ub is not None:
            bounds.append((from_bytes(f.field_type, lb), from_bytes(f.field_type, ub)))
    n = len(bounds)
    if n < 2:
        return 0.0
    bounds.sort()
    active: list = []  # min-heap of upper bounds still open
    pairs = 0
    for lo, hi in bounds:
        while active and active[0] < lo:
            heapq.heappop(active)
        pairs += len(active)
        heapq.heappush(active, hi)
    return 2.0 * pairs / n


def maintain_layout(
    table,
    spark,
    sort_cols: list,
    max_drift: float = 2.0,
    strategy: str = "sort",
    target_file_size: int | None = None,
) -> tuple[bool, float]:
    """One policy tick: measure drift on the leading sort column and
    recluster when it exceeds `max_drift`. Returns (reclustered, drift
    measured BEFORE any rewrite). Idempotent under the threshold — a
    freshly clustered table measures low and the tick is metadata-only."""
    drift = clustering_drift(table, sort_cols[0])
    if drift <= max_drift:
        return False, drift
    table.rewrite_data_files(
        spark,
        strategy=strategy,
        sort_cols=sort_cols,
        target_file_size=target_file_size,
    )
    table.refresh()
    return True, drift
