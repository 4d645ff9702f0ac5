"""The examples/copartitioned_layout.py recipe, run for real: one
clustering write per table, then enrichment, rollup, point-in-time
labels, and anti-probe decontamination — each checked against the
plain-DataFrame formulation and plan-asserted exchange-free."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from pyspark.sql import functions as F


def test_copartitioned_layout_recipe(tmp_path, spark):
    import copartitioned_layout as cl

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog

    catalog = FileSystemCatalog(str(tmp_path / "wh"))
    facts = spark.range(0, 3000).select(
        (F.col("id") % 40).cast("int").alias("f_entity"),
        (F.col("id") % 97).cast("double").alias("f_value"),
    )
    dims = spark.createDataFrame(
        [(i, "hot" if i % 3 == 0 else "cold") for i in range(40)],
        "d_entity int, d_segment string",
    )
    seg_counts, rollup = cl.demo(spark, catalog, facts, dims)
    exp_seg = (
        facts.join(dims, facts.f_entity == dims.d_entity)
        .groupBy("d_segment")
        .agg(F.count("*").alias("n2"))
    )
    assert (
        seg_counts.join(exp_seg, "d_segment").where("n != n2").count() == 0
    )
    exp_roll = facts.groupBy("f_entity").agg(
        F.count("f_value").alias("n2"), F.sum("f_value").alias("t2")
    )
    assert rollup.count() == 40
    assert (
        rollup.join(exp_roll, "f_entity")
        .where("n_events != n2 OR abs(total - t2) > 1e-9")
        .count()
        == 0
    )
    plan = rollup._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan  # final aggs, no exchange

    # point-in-time labels: backward, leakage-safe
    base = datetime.datetime(2024, 6, 1)
    feats = spark.createDataFrame(
        [(e, base + datetime.timedelta(hours=h), float(e * 10 + h)) for e in range(4) for h in (0, 5)],
        "f_entity int, fts timestamp, f_value double",
    )
    labels = spark.createDataFrame(
        [(e, base + datetime.timedelta(hours=3), e % 2) for e in range(4)],
        "l_entity int, lts timestamp, y int",
    )
    tf = cl.write_copartitioned(catalog, "feat_t", feats, "f_entity", buckets=4)
    tl = cl.write_copartitioned(catalog, "lab_t", labels, "l_entity", buckets=4)
    pit = cl.point_in_time_labels(
        spark, tl, tf, ("l_entity", "f_entity"), "lts", "fts"
    )
    rows = {r.l_entity: r.f_value for r in pit.collect()}
    # hour-3 labels must take the hour-0 feature (never the future hour-5)
    assert rows == {e: float(e * 10) for e in range(4)}

    # decontamination: anti probe
    corpus = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(20)], "doc_key int, body string"
    )
    bench = spark.createDataFrame([(i,) for i in range(0, 20, 4)], "bench_key int")
    tc = cl.write_copartitioned(catalog, "corpus_t", corpus, "doc_key", buckets=4)
    tb = cl.write_copartitioned(catalog, "bench_t", bench, "bench_key", buckets=4)
    clean = cl.decontaminate(spark, tc, tb)
    assert clean.count() == 15
    assert clean.where("doc_key % 4 = 0").count() == 0


def test_copartitioned_star_recipe(tmp_path, spark):
    import copartitioned_layout as cl

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog

    catalog = FileSystemCatalog(str(tmp_path / "wh2"))
    fact = spark.range(0, 1200).select(
        (F.col("id") % 16).cast("int").alias("e"), F.col("id").alias("v")
    )
    d1 = spark.createDataFrame([(i, i % 3) for i in range(16)], "e1 int, g int")
    d2 = spark.createDataFrame([(i, float(i)) for i in range(16)], "e2 int, w double")
    tf = cl.write_copartitioned(catalog, "sf", fact, "e", buckets=4)
    t1 = cl.write_copartitioned(catalog, "sd1", d1, "e1", buckets=4)
    t2 = cl.write_copartitioned(catalog, "sd2", d2, "e2", buckets=4)
    got = cl.star_features(
        spark,
        (tf, "e", ["e", "v"]),
        (t1, "e1", ["e1", "g"]),
        (t2, "e2", ["e2", "w"]),
    )
    exp = (
        fact.join(d1, fact.e == d1.e1)
        .join(d2, fact.e == d2.e2)
        .select("e", "v", "g", "w")
    )
    assert got.count() == exp.count() == 1200
    assert (
        got.groupBy("g").agg(F.sum("w").alias("s")).join(
            exp.groupBy("g").agg(F.sum("w").alias("s2")), "g"
        ).where("abs(s - s2) > 1e-9").count()
        == 0
    )
