"""Unit tests for distribution statistics (exact quantiles, histograms)
and the round-6 text additions (PII scan, term co-occurrence)."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

import pytest

from iceberg_go_distributed_spark.operators.stats import (
    ContinuousValueError,
    exact_quantiles,
    value_histogram,
)
from iceberg_go_distributed_spark.operators.text import (
    pii_scan,
    term_cooccurrence,
)


def _type1_quantile(sorted_vals, q):
    """Reference type-1 discrete quantile: smallest x with F(x) >= q."""
    k = math.ceil(q * len(sorted_vals))
    return sorted_vals[k - 1]


class TestExactQuantiles:
    def test_matches_reference_definition(self, spark):
        rng = random.Random(7)
        rows = [
            Row(g=g, v=round(rng.uniform(0, 100), 1))
            for g in ("a", "b")
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows)
        qs = (0.25, 0.5, 0.9, 0.99, 1.0)
        got = {
            (r["g"], r["q"]): r["quantile_value"]
            for r in exact_quantiles(df, "v", ["g"], qs=qs).collect()
        }
        by_g = {"a": [], "b": []}
        for r in rows:
            by_g[r.g].append(r.v)
        for g, vals in by_g.items():
            vals.sort()
            for q in qs:
                assert got[(g, q)] == _type1_quantile(vals, q), (g, q)

    def test_duplicate_heavy_values(self, spark):
        # 90% of mass on one value: every q <= 0.9 must return it
        df = spark.createDataFrame(
            [Row(g="x", v=5.0)] * 90 + [Row(g="x", v=float(i)) for i in range(91, 101)]
        )
        got = {
            r["q"]: r["quantile_value"]
            for r in exact_quantiles(df, "v", ["g"], qs=(0.5, 0.9, 0.95)).collect()
        }
        assert got[0.5] == 5.0
        assert got[0.9] == 5.0
        assert got[0.95] > 5.0

    def test_one_row_per_group_and_q(self, spark):
        df = spark.createDataFrame(
            [Row(g=str(g), v=float(v)) for g in range(3) for v in range(10)]
        )
        out = exact_quantiles(df, "v", ["g"], qs=(0.5, 0.9)).collect()
        assert len(out) == 3 * 2

    def test_nulls_excluded(self, spark):
        # SQL percentile semantics: nulls are neither ranked nor counted.
        # Without the filter, Spark's nulls-first orderBy would return
        # NULL as the low quantile and inflate n.
        df = spark.createDataFrame(
            [Row(g="x", v=None)] * 50 + [Row(g="x", v=float(i)) for i in range(1, 11)],
            schema="g string, v double",
        )
        got = {
            r["q"]: r["quantile_value"]
            for r in exact_quantiles(df, "v", ["g"], qs=(0.1, 0.5, 1.0)).collect()
        }
        assert got == {0.1: 1.0, 0.5: 5.0, 1.0: 10.0}

    def test_continuous_guard_raises_without_precision(self, spark):
        # float64 noise: distinct ≈ rows; with a lowered max_window_rows
        # the guard must refuse loudly instead of degrading to a
        # single-task window.
        rng = random.Random(11)
        df = spark.createDataFrame(
            [Row(g="x", v=rng.random()) for _ in range(5000)]
        )
        with pytest.raises(ContinuousValueError, match="precision"):
            exact_quantiles(df, "v", ["g"], max_window_rows=1000)

    def test_continuous_guard_prebins_with_precision(self, spark):
        rng = random.Random(11)
        vals = [rng.random() for _ in range(5000)]
        df = spark.createDataFrame([Row(g="x", v=v) for v in vals])
        out = exact_quantiles(
            df, "v", ["g"], qs=(0.5,), precision=2, max_window_rows=1000
        )
        # bounded window input: the compression now feeds the window at
        # most 101 distinct rounded values, far below the 5000 rows
        rounded = sorted(round(v, 2) for v in vals)
        assert out.collect()[0]["quantile_value"] == _type1_quantile(rounded, 0.5)
        compressed = (
            df.where(F.col("v").isNotNull())
            .select(F.round("v", 2).alias("v"))
            .distinct()
            .count()
        )
        assert compressed <= 101 < len(vals)

    def test_window_is_compressed_not_rowcount(self, spark):
        # the window input is distinct (group, value) pairs — assert the
        # aggregate sits below the window in the plan
        df = spark.createDataFrame([Row(g="x", v=1.0)] * 100)
        plan = (
            exact_quantiles(df, "v", ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "HashAggregate" in plan
        assert plan.index("Window") < plan.index("HashAggregate"), (
            "aggregate (distinct-value compression) must run before the window"
        )


class TestValueHistogram:
    def test_counts_and_edges(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", v=v) for v in (0.0, 24.9, 25.0, 49.9, -0.1, -25.0)]
        )
        got = {
            r["bin"]: (r["n"], r["bin_lo"])
            for r in value_histogram(df, "v", ["g"], 25.0).collect()
        }
        assert got[0] == (2, 0.0)  # [0, 25)
        assert got[1] == (2, 25.0)  # [25, 50)
        assert got[-1] == (2, -25.0)  # [-25, 0) — floor, not trunc


class TestPiiScan:
    def test_detects_shapes(self, spark):
        df = spark.createDataFrame(
            [
                Row(source="s1", text="contact me at jo.doe+x@mail.example.org today"),
                Row(source="s1", text="call 555-867-5309 or 555.867.5309"),
                Row(source="s1", text="server at 10.0.200.13 responded"),
                Row(source="s1", text="nothing sensitive here"),
                Row(source="s2", text="clean"),
            ]
        )
        got = {r["source"]: r for r in pii_scan(df).collect()}
        s1 = got["s1"]
        assert (s1["with_email"], s1["with_phone"], s1["with_ipv4"]) == (1, 1, 1)
        assert s1["docs"] == 4 and abs(s1["pii_rate"] - 0.75) < 1e-12
        s2 = got["s2"]
        assert s2["with_email"] == s2["with_phone"] == s2["with_ipv4"] == 0
        assert s2["pii_rate"] == 0.0

    def test_no_false_positives_on_plain_prose(self, spark):
        df = spark.createDataFrame(
            [Row(source="s", text="version 1.2 shipped at 3pm. cost: 12.50 dollars")]
        )
        r = pii_scan(df).collect()[0]
        # "1.2" / "12.50" are not IPv4 (needs 4 octets), no @, no phone
        assert r["with_email"] == r["with_phone"] == r["with_ipv4"] == 0


class TestTermCooccurrence:
    def test_small_corpus_exact(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="alpha beta gamma"),
                Row(doc_id=2, text="alpha beta"),
                Row(doc_id=3, text="alpha gamma"),
                Row(doc_id=4, text="beta beta gamma"),  # dup token counts once
            ]
        )
        out = term_cooccurrence(df, vocab_k=10, k=10, min_len=4).collect()
        got = {(r["t1"], r["t2"]): r["n"] for r in out}
        assert got == {
            ("alpha", "beta"): 2,
            ("alpha", "gamma"): 2,
            ("beta", "gamma"): 2,
        }

    def test_vocab_filter_bounds_pairs(self, spark):
        # vocab_k=1 → no pairs possible
        df = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta gamma delta")]
        )
        assert term_cooccurrence(df, vocab_k=1, k=10).collect() == []

    def test_min_len_filters_short_tokens(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="of the alpha beta"), Row(doc_id=2, text="of alpha beta")]
        )
        out = term_cooccurrence(df, vocab_k=10, k=10, min_len=4).collect()
        terms = {t for r in out for t in (r["t1"], r["t2"])}
        assert "of" not in terms and "the" not in terms

    def test_vocab_is_broadcast(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma")])
        plan = (
            term_cooccurrence(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan

    def test_explicit_vocabulary_matches_exact_topk(self, spark, sf_dir):
        """VERDICT r6 task 6: passing the exact top-k vocabulary must
        yield byte-identical output to the default (exact) path — the
        seam that lets 100 TB runs substitute a sampled/precomputed
        vocabulary and skip the full-corpus distinct."""
        from iceberg_go_distributed_spark.datasets import load_table

        docs = load_table(spark, sf_dir, "documents").limit(200)
        exact = term_cooccurrence(docs, vocab_k=12, k=15).collect()
        vocab = sorted({t for r in exact for t in (r["t1"], r["t2"])})
        # exact top-12 vocabulary, recomputed the way the operator does
        top = (
            docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
            .where("length(term) >= 4")
            .distinct()
            .groupBy("term")
            .count()
            .orderBy(F.col("count").desc(), F.col("term").asc())
            .limit(12)
        )
        topk = [r["term"] for r in top.collect()]
        assert set(vocab) <= set(topk)
        given = term_cooccurrence(docs, k=15, vocabulary=topk).collect()
        assert [tuple(r) for r in given] == [tuple(r) for r in exact]
        # the explicit-vocabulary plan must NOT aggregate the token
        # table for a vocabulary: the only Aggregate left is the final
        # pair count on (t1, t2) — no count-per-term pass feeds the join
        import re

        plan = (
            term_cooccurrence(docs, vocabulary=topk)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        per_term_aggs = [
            m
            for m in re.findall(r"Aggregate \[(\w+)#", plan)
            if m == "term"
        ]
        assert not per_term_aggs, plan

    def test_approximate_vocabulary_counts_still_exact(self, spark):
        """An approximate vocabulary changes WHICH pairs appear, never
        their counts: counts within the given vocabulary equal the
        exact corpus presence counts."""
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="alpha beta gamma delta"),
                Row(doc_id=2, text="alpha beta"),
                Row(doc_id=3, text="alpha gamma epsilon"),
            ]
        )
        out = term_cooccurrence(df, k=10, vocabulary=["alpha", "gamma"]).collect()
        assert {(r["t1"], r["t2"]): r["n"] for r in out} == {("alpha", "gamma"): 2}
