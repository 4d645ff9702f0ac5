"""Co-located (bucketed) fact⋈fact joins — the 100 TB shuffle-elimination
pattern SCALE.md prescribes, demonstrated and plan-asserted.

Writing both fact tables bucketed by the join key (same bucket count)
lets Spark's scan report a compatible output partitioning, so the join
runs with ZERO exchanges: at 100 TB this removes the single largest
shuffle in the TPC-H-shaped workloads (lineitem⋈orders on orderkey).
The write-side cost is one clustering shuffle per table, paid once,
amortized over every subsequent join/aggregate on that key.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    # managed tables land in the session's spark-warehouse dir; DROP
    # TABLE below removes the files (managed-table semantics)
    from iceberg_go_distributed_spark.datasets import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_runs_without_exchange(spark, bucketed_pair):
    li, orders = bucketed_pair
    # force the join strategy decision to be about partitioning, not size
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: no exchange on
        # either join key anywhere in the plan (the only exchange left
        # is the final small groupBy(o_custkey) aggregate)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan

        # and the result matches the unbucketed join
        got = {(r.o_custkey, r.n) for r in joined.collect()}
        want = {
            (r.o_custkey, r.n)
            for r in (
                li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_custkey")
                .agg(F.count("*").alias("n"))
                .collect()
            )
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
