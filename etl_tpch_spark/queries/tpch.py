"""Adapted TPC-H query set (north star: "Spark SQL on TPC-H queries").

The reference computes exactly one TPC-H-derived query (Q3 variant,
pipeline/reduce.py:24-78 → queries/flagship.py).  This module widens the
surface to the full TPC-H *operator shapes* adapted to the driver
testdata schema (FIXTURES.md: no partsupp table; no comment/phone/
address/shipmode/commitdate/receiptdate columns), so each query keeps
its canonical plan shape — the thing that matters for engine coverage —
while remaining oracle-checkable on the fixtures:

- Q1  pricing summary        → multi-agg hash aggregate
- Q4  order priority         → EXISTS ⇒ left-semi join
- Q5  local supplier volume  → 6-way join with dim broadcast chain
- Q6  forecast revenue       → scan-heavy filter + global agg
- Q7  volume shipping        → two-nation join + conditional filter
- Q8  market share           → conditional aggregation over a join
- Q9  product-type profit    → LIKE filter + multi-fact join
- Q10 returned items         → group-by + top-k
- Q12 priority shipping      → conditional (CASE) aggregation
- Q13 customer distribution  → outer join + two-level aggregate
- Q14 promo revenue          → ratio of conditional sums
- Q15 top supplier           → agg + max scalar subquery (view-style)
- Q16 brand/type counts      → anti-join + count distinct
- Q17 small-quantity orders  → correlated avg subquery per part
- Q18 large orders           → HAVING + semi-joined top-k
- Q19 disjunctive predicate  → OR-of-ANDs pushdown join
- Q20 part promo suppliers   → nested semi joins
- Q21 waiting orders         → semi + anti join combination
- Q22 global sales opportunity → anti join + scalar subquery

Q2/Q11 (the partsupp-dependent shapes) live in ``tpch_partsupp.py``
over a deterministically derived partsupp; Q3 is the flagship
(``flagship.py``) — together the full 22-query surface.

Scale notes: each query's join order puts dimensions (region/nation/
customer/supplier/part at ≤1/150 of lineitem) on the broadcast side;
fact⋈fact joins pre-filter both sides.  All aggregates are expressed so
Catalyst plans partial (map-side) aggregation; no Python touches rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.agg import davg, dratio, dsum, money, money8, one, qty, rate, rev_dec
from ..registry import query

# Fixed parameters (explicit, never now(): SURVEY.md §7 risk a).
Q1_CUTOFF = "2000-12-01 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag,
               l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity), 2) AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(l_extendedprice), 2) AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
               count(*)                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide hash-aggregate.  Single scan, 8 aggs,
    partial+final HashAggregate; filter pushed to parquet row groups."""
    t = Tables(spark, sf_dir)
    disc_price = rev_dec()
    return (
        t.lineitem.filter(
            F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money(F.col("l_quantity")), "sum_qty"),
            dsum(money(F.col("l_extendedprice")), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (one() + rate(F.col("l_tax"))), "sum_charge"),
            davg(money(F.col("l_quantity")), F.col("l_quantity"), "avg_qty"),
            davg(money(F.col("l_extendedprice")), F.col("l_extendedprice"), "avg_price"),
            davg(rate(F.col("l_discount")), F.col("l_discount"), "avg_disc", 4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join.  Adapted predicate:
    testdata has no l_commitdate/l_receiptdate, so "late" means shipped
    >60 days after order date.  Semi join sends only (l_orderkey,
    l_shipdate) through the shuffle and short-circuits per key."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    sem = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join.  region/nation/supplier/customer are all
    broadcast; only orders⋈lineitem shuffles.  (Classic region filter
    dropped — keeps all regions so the result is several rows.)"""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    j = (
        t.lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return j.groupBy("n_name").agg(
        dsum(rev_dec(), "revenue")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + global agg — the predicate-pushdown
    benchmark.  All four predicates reach the parquet reader."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money(F.col("l_extendedprice")) * rate(F.col("l_discount")), "revenue")
        )
    )


@query(
    "q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   extract(year FROM l_shipdate) AS l_year,
                   CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year.  Adapted: any
    pair of distinct nations (classic pins FRANCE/GERMANY — too sparse at
    test SF).  extract(year) both sides; nation joined twice (aliased)."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .withColumn("volume", rev_dec())
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_region = 'ASIA' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
        FROM (
            SELECT extract(year FROM o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
                   r_name AS supp_region
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
        ) all_sales
        GROUP BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional sum / total sum per
    year.  Adapted: share of ASIA-nation suppliers in global volume
    (testdata has no p_type='ECONOMY ANODIZED STEEL' equivalent filter
    population at small SF)."""
    t = Tables(spark, sf_dir)
    j = (
        t.lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", rev_dec())
    )
    asia = (
        F.when(F.col("r_name") == "ASIA", F.col("volume"))
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    )
    return j.groupBy("o_year").agg(
        dratio(asia, F.col("volume"), "mkt_share", 4)
    )


@query(
    "q9_product_type_profit",
    oracle="""
        SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   extract(year FROM o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     - CAST(p_retailprice AS DECIMAL(8,2))
                       * CAST(l_quantity AS DECIMAL(4,1))
                       * CAST(0.6 AS DECIMAL(2,1)) AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%a%'
        ) profit
        GROUP BY nation, o_year
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation×year with LIKE-filtered part dim.
    Adapted cost term: no partsupp ⇒ cost modeled as 60% of retail price
    (keeps the multi-fact join + expression shape)."""
    t = Tables(spark, sf_dir)
    j = (
        t.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(
            F.broadcast(
                t.part.filter(F.col("p_name").like("%a%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    amount = (
        rev_dec()
        - money8(F.col("p_retailprice"))
        * qty(F.col("l_quantity"))
        * F.lit("0.6").cast("decimal(2,1)")
    )
    return (
        j.withColumn("nation", F.col("n_name"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("amount", amount)
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
    )


@query(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
               round(c_acctbal, 2) AS c_acctbal,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items.
    TakeOrderedAndProject for the limit; nation broadcast."""
    t = Tables(spark, sf_dir)
    j = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
        .join(
            t.lineitem.filter(F.col("l_returnflag") == "R").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(rev_dec(), "revenue")
        )
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q12_priority_shipping",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional counts after a fact join.
    Adapted: no l_shipmode column ⇒ group by l_linestatus."""
    t = Tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = t.orders.select("o_orderkey", "o_orderpriority").join(
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        ).select("l_orderkey", "l_linestatus"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: outer join + double aggregation (count of counts).
    Adapted filter: no o_comment ⇒ exclude '4-NOT SPECIFIED' priority."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        t.customer.select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle="""
        SELECT round(
                 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage (ratio of conditional sums).
    part dim broadcasts; testdata p_type is a plain category ⇒ equality
    instead of LIKE 'PROMO%'."""
    t = Tables(spark, sf_dir)
    rev = rev_dec()
    j = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).join(
        F.broadcast(t.part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = (
        F.when(F.col("p_type") == "PROMO", rev)
        .otherwise(F.lit(0).cast("decimal(18,4)"))
    )
    return j.agg(
        dratio(promo, rev, "promo_revenue", 2, scale=100.0)
    )


@query(
    "q15_top_supplier",
    oracle="""
        WITH revenue_view AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue_view ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue_view)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier via agg view + scalar-max subquery.
    Spark form: compute the view once, self-join against its max — the
    view DataFrame is reused (Catalyst may or may not dedup the subplan;
    at scale, `.cache()` the view — here it's tiny)."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(rev_dec(), "total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t.supplier.select("s_suppkey", "s_name")
        .join(F.broadcast(rev), F.col("s_suppkey") == F.col("supplier_no"))
        .join(
            F.broadcast(mx), F.col("total_revenue") == F.col("mx"), "inner"
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_brand_type_counts",
    oracle="""
        SELECT p_brand, p_type,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (anti join) + COUNT DISTINCT.  Adapted:
    no partsupp ⇒ count distinct *lineitem* suppliers per brand/type;
    "complaints" filter becomes negative account balance."""
    t = Tables(spark, sf_dir)
    bad_supp = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                t.part.filter(
                    (F.col("p_brand") != "Brand#1")
                    & (F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20))
                ).select("p_partkey", "p_brand", "p_type")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return j.groupBy("p_brand", "p_type").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "q17_small_quantity_orders",
    oracle="""
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < (
              SELECT 0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                                 AS DOUBLE) / count(l_quantity))
              FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg-per-part subquery → pre-aggregate the
    per-part average once and join it back (the classic decorrelation;
    Catalyst does the same rewrite for the SQL form)."""
    t = Tables(spark, sf_dir)
    # threshold via exact decimal sum / count: avg(double) folds in
    # partition order and can flip a boundary row between runs/engines
    part_avg = t.lineitem.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.5)
            * (F.sum(qty(F.col("l_quantity"))).cast("double")
               / F.count("l_quantity"))
        ).alias("qty_threshold")
    )
    j = (
        t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            F.broadcast(
                t.part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(part_avg, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return j.agg(
        F.round(F.sum(money(F.col("l_extendedprice"))).cast("double") / 7.0, 2).alias("avg_yearly")
    )


@query(
    "q18_large_orders",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered semi join + top-k.  The big-order key
    set is computed by one grouped agg over lineitem, then used as a
    left-semi probe — at 100 TB that agg is the only extra shuffle and
    its output (few keys) broadcasts."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    j = (
        t.orders.join(
            F.broadcast(big),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t.lineitem.select("l_orderkey", "l_quantity"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(money(F.col("l_quantity")), "sum_qty"))
        .withColumn("o_totalprice", F.round("o_totalprice", 2))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 30)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 40)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs join predicate.  Expressed as a plain join +
    disjunctive filter; Catalyst extracts the common p_partkey equi-key
    so it stays a hash join, not a nested-loop."""
    t = Tables(spark, sf_dir)
    j = t.lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(
        F.broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 40))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 50))
    )
    return j.filter(cond).agg(
        dsum(rev_dec(), "revenue")
    )


@query(
    "q20_promo_part_suppliers",
    oracle="""
        SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_type = 'PROMO'
            )
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
        )
        ORDER BY s_name
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries → chained left-semi joins.
    Adapted: no partsupp ⇒ "supplied a promo part in 1996" via lineitem."""
    t = Tables(spark, sf_dir)
    promo_parts = t.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_keys = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(promo_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_suppkey")
    )
    return (
        t.supplier.join(
            supp_keys, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_waiting_orders",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY s_name
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the semi+anti combination ("only supplier who
    shipped late on a multi-supplier order").  Adapted lateness: shipped
    >30 days after order date (no receipt/commit dates in testdata).

    Spark plan: the EXISTS/NOT EXISTS pair over the same table becomes
    one per-(order,supplier) aggregate joined back — cheaper at scale
    than two correlated semi/anti shuffles of lineitem."""
    t = Tables(spark, sf_dir)
    orders_f = t.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l1 = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
            ).cast("int"),
        )
    )
    # per (order, supplier): any line late?
    per_os = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    # per order: how many suppliers, how many late suppliers
    per_o = per_os.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    # the culprit rows: late lines whose order has >1 supplier and exactly
    # one late supplier (l1 row count per culprit matches the SQL's join
    # row multiplicity: one output row per late *line*)
    culprit = (
        l1.filter(F.col("is_late") == 1)
        .join(per_o, F.col("l_orderkey") == F.col("agg_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        culprit.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_sales_opportunity",
    oracle="""
        SELECT c_nationkey, count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / count(*)
            FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        GROUP BY c_nationkey
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join.
    Adapted: no c_phone ⇒ group by c_nationkey instead of country code."""
    t = Tables(spark, sf_dir)
    avg_bal = (
        t.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(money(F.col("c_acctbal"))).cast("double")
             / F.count(F.lit(1))).alias("ab")
        )
    )
    rich = t.customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(
        t.orders.select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(money(F.col("c_acctbal")), "totacctbal"),
    )
