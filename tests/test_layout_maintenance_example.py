"""examples/layout_maintenance.py: drift metric + recluster policy loop."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark


def _df(spark, n, seed):
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.abs(F.xxhash64("id", F.lit(seed)) % 1000).alias("x"),
    )


def test_drift_detection_and_recluster_loop(tmp_path, spark):
    from layout_maintenance import clustering_drift, maintain_layout

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    df = _df(spark, 20_000, 1)
    t = cat.create_table("db.layout", schema_from_spark(df.schema))
    t.append(df.repartition(8))  # 8 files, all spanning ~[0, 1000)

    # unclustered: every file overlaps every other
    drift0 = clustering_drift(t, "x")
    assert drift0 > 5.0, drift0

    total = sum(k.file.file_size_in_bytes for k in t.scan().plan_files())
    did, measured = maintain_layout(
        t, spark, ["x"], max_drift=2.0, target_file_size=max(total // 10, 1)
    )
    assert did and measured == drift0
    drift1 = clustering_drift(t, "x")
    assert drift1 <= 2.0, drift1

    # freshly clustered: the next tick is a metadata-only no-op
    did2, measured2 = maintain_layout(t, spark, ["x"], max_drift=2.0)
    assert not did2 and measured2 == drift1

    # appends erode the layout; the loop catches it and pruning recovers
    for seed in (2, 3, 4):
        t.append(_df(spark, 5_000, seed).repartition(2))
    assert clustering_drift(t, "x") > 2.0
    flt = E.and_(E.greater_than_or_equal("x", 500), E.less_than("x", 550))
    did3, _ = maintain_layout(t, spark, ["x"], max_drift=2.0)
    assert did3
    n_all = len(t.scan().plan_files())
    n_hit = len(t.scan(row_filter=flt).plan_files())
    assert n_hit <= max(2, n_all // 4), f"{n_hit}/{n_all}"
    # and no rows were lost across two rewrites + three appends
    assert t.scan().to_df(spark).count() == 35_000


def test_drift_edge_cases(tmp_path, spark):
    from layout_maintenance import clustering_drift

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    df = _df(spark, 100, 1)
    t = cat.create_table("db.single", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    assert clustering_drift(t, "x") == 0.0  # one file: nothing to overlap
    with pytest.raises(ValueError, match="unknown column"):
        clustering_drift(t, "nope")
