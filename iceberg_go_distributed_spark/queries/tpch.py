"""TPC-H-derived query suite over the driver testdata star schema.

Adapted to the available columns (no partsupp, no commit/receipt dates —
see TESTDATA.md). DataFrame-API implementations with explicit broadcast
hints for dimension tables; each has a DuckDB oracle with identical
output aliases and identical DECIMAL-exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..datasets import load_table
from . import CHARGE, REV, SUM_REV, query


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
# Q1 — pricing summary report
Q1_AGGS = f"""
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({REV}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
"""


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {Q1_AGGS}
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: scan-filter-aggregate; partial aggregation map-side",
)
def q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[F.expr(e) for e in _split_aggs(Q1_AGGS)])
    )


def _split_aggs(aggs: str) -> list[str]:
    """Split a top-level comma-separated aggregate list."""
    out, depth, cur = [], 0, []
    for ch in aggs:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [a for a in out if a]


# --------------------------------------------------------------------------
# Q3 — shipping priority
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, CAST(SUM({REV}) AS DOUBLE) AS revenue, o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="join fact-to-fact with broadcast dim, top-k with deterministic ties",
)
def q3(spark, sf_dir):
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1998-03-15").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") > cut)
        .join(orders.where(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(f"CAST(SUM({REV}) AS DOUBLE)").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS adapted: any line shipped after order date)
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="left-semi join (EXISTS)",
)
def q4(spark, sf_dir):
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume (customer and supplier in same nation)
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({REV}) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="multi-way join: two facts + four broadcast dims",
)
def q5(spark, sf_dir):
    cust, orders, li, supp, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.expr(f"CAST(SUM({REV}) AS DOUBLE)").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="pure scan-filter-agg; parquet predicate pushdown",
)
def q6(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)"
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year, {REV} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="self-joined dimension (nation x2), year extraction",
)
def q7(spark, sf_dir):
    supp, li, orders, cust, nation = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    df = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
        )
    )
    return (
        df.withColumn("l_year", F.expr("CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)"))
        .withColumn("volume", F.expr(REV))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr("CAST(SUM(volume) AS DOUBLE)").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST({REV} AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region    ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="7-way join + conditional aggregation",
)
def q8(spark, sf_dir):
    part, li, supp, orders, cust, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    df = (
        li.join(F.broadcast(part.where(F.col("p_type") == "ECONOMY")), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region.where(F.col("r_name") == "AMERICA")), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.expr("CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)"))
        .withColumn("volume", F.expr(f"CAST({REV} AS DECIMAL(18,4))"))
    )
    return df.groupBy("o_year").agg(
        F.expr(
            "CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
            " / CAST(SUM(volume) AS DOUBLE)"
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product type profit (adapted: cost = p_retailprice * qty, no partsupp)
PROFIT = (
    f"CAST({REV} AS DECIMAL(18,4)) - "
    "CAST(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))"
)


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {PROFIT} AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="LIKE-filtered dim join, derived profit measure",
)
def q9(spark, sf_dir):
    part, li, supp, orders, nation = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return (
        li.join(F.broadcast(part.where(F.col("p_name").like("%bolt%"))), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)").alias("o_year"),
            F.expr(PROFIT).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.expr("CAST(SUM(amount) AS DOUBLE)").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned item reporting
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({REV}) AS DOUBLE) AS revenue, c_acctbal, n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="top-k customers by lost revenue",
)
def q10(spark, sf_dir):
    cust, orders, li, nation = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(f"CAST(SUM({REV}) AS DOUBLE)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="left outer join + double aggregation",
)
def q13(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14 — promotion effect
@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE) *
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM({REV}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="conditional aggregation over broadcast join",
)
def q14(spark, sf_dir):
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                "CAST(100.0 AS DOUBLE) * "
                f"CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
                f" / CAST(SUM({REV}) AS DOUBLE)"
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by revenue
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="agg + scalar-subquery max (window in Spark impl)",
)
def q15(spark, sf_dir):
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.expr(f"CAST(SUM({REV}) AS DOUBLE)").alias("total_revenue"))
    )
    # scalar max as a 1-row broadcast: scales (no single-partition window)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).where(F.col("total_revenue") == F.col("mx"))
    return top.join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="correlated scalar subquery → per-key avg join",
)
def q17(spark, sf_dir):
    li, part = _t(spark, sf_dir, "lineitem", "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part.where(F.col("p_brand") == "Brand#3")), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers
@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 170)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="IN-subquery (semi join) + group-having",
)
def q18(spark, sf_dir):
    # One lineitem aggregation serves both the HAVING gate and the output
    # sum: every output group key (customer, order columns) is
    # functionally dependent on o_orderkey, so the per-group SUM equals
    # the per-order SUM already computed for the gate. The naive shape
    # (semi-join the gate back onto lineitem, re-shuffle, re-aggregate)
    # scans and exchanges the fact table twice; this plan scans it once,
    # and the >170 filter leaves so few orders that both remaining joins
    # broadcast — no fact⋈fact exchange at all.
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("tq"))
        .where(F.col("tq") > 170)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("tq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive predicates)
@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="disjunctive multi-column predicates over join",
)
def q19(spark, sf_dir):
    li, part = _t(spark, sf_dir, "lineitem", "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return joined.where(cond).agg(
        F.expr(f"CAST(SUM({REV}) AS DOUBLE)").alias("revenue"), F.count("*").alias("n_lines")
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti join + avg subquery)
@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_custkey % 10 AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    """,
    doc="anti join + uncorrelated scalar subquery",
)
def q22(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # exact decimal sum / count: order-independent, matches the oracle bit-for-bit.
    # 1-row broadcast cross-join keeps the plan lazy and fully distributed
    # (no driver collect()).
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .select((F.col("c_custkey") % 10).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q12 — shipping-delay priority classes (adapted: no l_shipmode /
# commit/receipt dates in the testdata — "late" is re-expressed as
# shipped > 60 days after the order date, and the group key is the ship
# year instead of the ship mode; the operator shape is unchanged:
# fact⋈fact equi-join + two-branch conditional counts).
@query(
    "q12_late_priority_lines",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY ship_year
    """,
    doc="TPC-H Q12 (adapted): fact-fact join + conditional two-branch counts",
)
def q12(spark, sf_dir):
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .withColumn("ship_year", F.expr("CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)"))
        .groupBy("ship_year")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted "late" predicate as in
# Q12 above; grouped over every nation instead of filtering to one so the
# result set is deterministic without a tie-broken LIMIT).
#
# The reference plan for this query is a double-correlated EXISTS /
# NOT-EXISTS over the fact table; the Spark-first rewrite turns both
# subqueries into per-order window aggregates (distinct suppliers,
# distinct LATE suppliers) over ONE l_orderkey exchange of the fact —
# instead of three fact-table scans or an agg + join-back (two more
# fact-sized exchanges). Order groups are tiny (<= 7 lines), so the
# collect_set window state is bounded.
@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT n_name, s_name, COUNT(*) AS numwait
    FROM fl l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE l1.late
      AND EXISTS (
        SELECT 1 FROM fl l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM fl l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late
      )
    GROUP BY n_name, s_name
    """,
    doc="TPC-H Q21 (adapted): exists + not-exists over the fact table as one keyed aggregate",
)
def q21(spark, sf_dir):
    supp, li, orders, nation = _t(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    f_orders = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    l = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    # Both correlated subqueries collapse into per-order window counts:
    #   EXISTS(other supplier)            ⟺ nsupp > 1
    #   NOT EXISTS(other LATE supplier)   ⟺ nlate = 1  (l1 itself is late,
    #     so the single distinct late supplier must be l1's)
    # (countDistinct is not a window function; size(collect_set) is the
    # standard equivalent and the per-order set is bounded.)
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    waiting = (
        l.withColumn("nsupp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "nlate",
            F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
        )
        .where(F.col("late") & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    return (
        waiting.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: the testdata has no partsupp, so
# the part⋈supplier relation and its supply cost derive from lineitem —
# cost(part, supp) = MIN net line price that supplier ever charged for
# that part. The operator shape is the original's: region-filtered
# supplier dimension, a part filter, and a correlated per-part MIN that
# keeps only the cheapest supplier(s) of each part).
#
# Spark-first plan: dims (supplier⋈nation⋈region, part) broadcast into
# the fact scan, ONE exchange to aggregate (partkey, suppkey), then a
# per-part window MIN over the tiny aggregated relation — never a second
# fact-sized shuffle, no correlated re-scan.
@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN({REV}) AS cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'STANDARD'
      GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(cost AS DOUBLE) AS supply_cost
    FROM ps JOIN part ON p_partkey = ps.l_partkey
            JOIN supplier ON s_suppkey = ps.l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
    WHERE cost = (SELECT MIN(cost) FROM ps p2 WHERE p2.l_partkey = ps.l_partkey)
    """,
    doc="TPC-H Q2 (adapted): correlated per-part MIN via window over aggregated facts",
)
def q2(spark, sf_dir):
    from pyspark.sql import Window

    part, supp, li, nation, region = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    eur_supp = (
        supp.join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(region, F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "EUROPE")
    )
    target_parts = part.where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    ps = (
        li.join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(target_parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(f"MIN({REV})").alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    cheapest = ps.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    return (
        cheapest.join(
            F.broadcast(eur_supp.select("s_suppkey", "s_acctbal", "s_name", "n_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(target_parts.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification (adapted: part "value" held by one
# nation's suppliers derives from lineitem revenue instead of
# ps_supplycost*ps_availqty; the shape is the original's — a grouped
# aggregate filtered against an uncorrelated scalar fraction of the
# grand total, all in exact DECIMAL so the threshold gate is bit-stable).
@query(
    "q11_important_stock",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, SUM({REV}) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS value
    FROM pv
    WHERE val > (SELECT SUM(val) * CAST(0.002 AS DECIMAL(6,4)) FROM pv)
    """,
    doc="TPC-H Q11 (adapted): group-by gated on an uncorrelated scalar fraction of the total",
)
def q11(spark, sf_dir):
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (
        supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    pv = (
        li.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.expr(f"SUM({REV})").alias("val"))
    )
    # 1-row broadcast threshold keeps the plan lazy and distributed
    threshold = pv.agg(
        F.expr("SUM(val) * CAST(0.002 AS DECIMAL(6,4))").alias("cutoff")
    )
    return (
        pv.crossJoin(F.broadcast(threshold))
        .where(F.col("val") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("value"),
        )
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted: the part⋈supplier relation
# is the DISTINCT (l_partkey, l_suppkey) pairs observed in lineitem; the
# "customer complaints" exclusion becomes suppliers with negative
# account balance. Shape preserved: NOT-IN anti join + count-distinct
# suppliers per part attribute group).
@query(
    "q16_part_supplier_relation",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (adapted): distinct-pair relation + anti join + count-distinct group",
)
def q16(spark, sf_dir):
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    complainers = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted_parts = part.where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(complainers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(wanted_parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: no ps_availqty, so "excess
# stock" becomes supply dominance — a supplier qualifies when it shipped
# more than HALF of a small-part's 1996 volume; the comparison is
# cross-multiplied (2*sqty > total) so both engines gate on exact
# DECIMALs, never a divided double. Shape preserved: name-filtered
# parts → date-filtered facts → per-(part,supplier) aggregate compared
# against a per-part aggregate → semi join up to suppliers⋈nation).
@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sqty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, SUM(sqty) AS tqty FROM shipped GROUP BY l_partkey)
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT shipped.l_suppkey FROM shipped JOIN tot USING (l_partkey)
      WHERE sqty * 2 > tqty)
    """,
    doc="TPC-H Q20 (adapted): nested per-part dominance aggregate + semi join chain",
)
def q20(spark, sf_dir):
    from pyspark.sql import Window

    li, part, supp, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    small_parts = part.where(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("sqty"))
    )
    # per-part total via window over the aggregated relation (tiny after
    # the part/date filters) — avoids a second fact-sized exchange
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("tqty", F.sum("sqty").over(w))
        .where(F.col("sqty") * 2 > F.col("tqty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )
