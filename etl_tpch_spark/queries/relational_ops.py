"""Relational-operator coverage queries (SURVEY.md §2.3, §2.5-2.8).

The reference's relational surface is tiny (filters, two inner joins,
one grouped sum, a sort+head — reduce.py:43-78); this module registers
the rest of the standard relational algebra the engine exposes, each
with a DuckDB oracle:

set ops (§2.6), distinct, rollup/cube/grouping-sets, pivot, analytic
window functions (§2.7), scalar function showcase (§2.8 F4-F8), and the
two time-series joins Spark lacks natively (as-of, range) built in
operators/joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import Tables, register_views
from ..functions.agg import money
from ..operators.joins import asof_join
from ..registry import query

# ---------------------------------------------------------------- set ops


@query(
    "setop_union_distinct",
    oracle="""
        SELECT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers active in 1996 ∪ high-balance ones.
    Spark: union + distinct → one shuffle for the dedup."""
    t = Tables(spark, sf_dir)
    active = (
        t.customer.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        ).select("c_custkey")
    )
    rich = t.customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return active.union(rich).distinct()


@query(
    "setop_intersect",
    oracle="""
        SELECT DISTINCT l_partkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT DISTINCT l_partkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: parts sold in both 1996 and 1997."""
    t = Tables(spark, sf_dir)

    def sold_in(y: int) -> DataFrame:
        return (
            t.lineitem.filter(
                (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("l_partkey")
            .distinct()
        )

    return sold_in(1996).intersect(sold_in(1997))


@query(
    "setop_except",
    oracle="""
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered in 1996 but not 1997 (churn)."""
    t = Tables(spark, sf_dir)

    def ordered_in(y: int) -> DataFrame:
        return (
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    return ordered_in(1996).exceptAll(ordered_in(1997)).distinct()


# ------------------------------------------------- multi-dim aggregates


@query(
    "agg_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_spend
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals status → status×priority → grand."""
    t = Tables(spark, sf_dir)
    return t.orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(money(F.col("o_totalprice"))), 2)
        .cast("double")
        .alias("total_spend"),
    )


@query(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations of returnflag × linestatus."""
    t = Tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (engine exposes both DataFrame
    and spark.sql paths; Catalyst expands to Expand + single agg)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "agg_pivot",
    oracle="""
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order status into columns per market segment.  Explicit
    pivot values ⇒ single pass, no value-discovery job."""
    t = Tables(spark, sf_dir)
    j = t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_mktsegment", "o_orderstatus")
    piv = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    # pivot yields nullable counts; align with oracle's 0-filled sums
    return piv.select(
        "c_mktsegment",
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )


@query(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT): exact form.  (approx_count_distinct is the
    constant-memory scale path but is engine-specific HLL — offered in
    the API, not oracle-comparable.)"""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------- window functions


@query(
    "window_running_total",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend — cumulative window aggregate.
    Decimal sum keeps the prefix sums bit-deterministic."""
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money(F.col("o_totalprice")))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               lag(o_orderdate) OVER w AS prev_order_date,
               lead(o_orderdate) OVER w AS next_order_date,
               CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
                    AS BIGINT) AS days_since_prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-order gaps per customer."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_order_date"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias(
            "days_since_prev"
        ),
    )


@query(
    "window_rank",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_orderdate,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_orderdate, o_orderkey)
                    AS INTEGER) AS quartile
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-02-01'
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (ties on order date) + ntile quartiles."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_orderdate")
    wt = W.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_orderdate",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
    )


# ------------------------------------------------- as-of & range joins


@query(
    "join_asof_purchases",
    oracle="""
        WITH p AS (
            SELECT user_id, ts,
                   max(value) AS asof_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        ), c AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS asof_ts, p.asof_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's latest at-or-before
    purchase (operators/joins.py asof_join — union+window, one shuffle).
    Oracle: DuckDB's native ASOF JOIN."""
    t = Tables(spark, sf_dir)
    purchases = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_ts"),
        F.col("asof_value"),
    )


@query(
    "join_range_clicks_before_error",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               count(c.event_id) AS clicks_5min_before
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        LEFT JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND c.ts >= e.ts - INTERVAL 5 MINUTE
         AND c.ts <  e.ts
        GROUP BY e.event_id, e.user_id, e.ts
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within the 5 minutes before each error, per
    user.  Equi key (user_id) drives the hash join; the time range is a
    post-join filter — no O(n·m) explosion."""
    t = Tables(spark, sf_dir)
    errors = t.events.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id").alias("e_user"), F.col("ts")
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = errors.join(
        clicks,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 5 MINUTE"))
        & (F.col("c_ts") < F.col("ts")),
        "left_outer",
    )
    return (
        j.groupBy("event_id", "e_user", "ts")
        .agg(F.count("c_event_id").alias("clicks_5min_before"))
        .select(
            "event_id", F.col("e_user").alias("user_id"), "ts",
            "clicks_5min_before",
        )
    )


# ------------------------------------------------- scalar function showcase


@query(
    "scalar_string_functions",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                       AS name_upper,
               lower(p_brand)                      AS brand_lower,
               printf('%09d', p_partkey)           AS key_padded,
               concat(p_brand, '-', p_type)        AS brand_type,
               replace(p_name, ' ', '_')           AS name_snake,
               substr(p_type, 1, 3)                AS type_prefix,
               CAST(length(p_name) AS INTEGER)     AS name_len,
               CAST(round(CAST(p_retailprice AS DECIMAL(8,2)), 1) AS DOUBLE)
                                                   AS price_rounded
        FROM part WHERE p_partkey <= 100
    """,
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math functions (SURVEY.md §2.8 F4-F6, F8):
    upper/lower (reference reduce.py:59 segment.upper()), zero-pad
    (dashboard.py:46 f\"{x:09}\" → format_string), round (dashboard.py:47),
    concat/replace/substr/length."""
    t = Tables(spark, sf_dir)
    return t.part.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.format_string("%09d", F.col("p_partkey")).alias("key_padded"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.substring(F.col("p_type"), 1, 3).alias("type_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.round(F.col("p_retailprice").cast("decimal(8,2)"), 1)
        .cast("double")
        .alias("price_rounded"),
    )


@query(
    "scalar_datetime_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(extract(year  FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(extract(month FROM o_orderdate) AS INTEGER) AS o_month,
               CAST(extract(day   FROM o_orderdate) AS INTEGER) AS o_day,
               CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
               date_trunc('month', o_orderdate)   AS month_start,
               o_orderdate + INTERVAL 90 DAY      AS due_date,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')
                    AS INTEGER)                   AS days_to_cutoff,
               strftime(o_orderdate, '%m/%d/%Y')  AS display_date
        FROM orders WHERE o_orderkey <= 200
    """,
)
def scalar_datetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time functions (SURVEY.md §2.8 F7 + event-time
    arithmetic): extract fields, truncate, interval add, datediff,
    display formatting (reference dashboard.py:58-69 MM/DD/YYYY)."""
    t = Tables(spark, sf_dir)
    return t.orders.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(
            F.lit("1998-01-01").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_cutoff"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("display_date"),
    )


@query(
    "scalar_conditional_functions",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END             AS tier,
               coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR')
                                                   AS segment_relabeled,
               CAST(greatest(c_acctbal, 0.0) AS DOUBLE) AS bal_floor,
               CAST(least(c_acctbal, 5000.0) AS DOUBLE) AS bal_cap,
               (c_acctbal > 1000 AND c_nationkey < 10) AS is_target
        FROM customer
    """,
)
def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalars: CASE/WHEN, coalesce/nullif, greatest/least,
    boolean expressions."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")
        ).alias("segment_relabeled"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap"),
        ((F.col("c_acctbal") > 1000) & (F.col("c_nationkey") < 10)).alias(
            "is_target"
        ),
    )


@query(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5)  AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               CAST(count(*) AS BIGINT)        AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median + quartiles) per group —
    the distribution-profiling aggregate missing from plain TPC-H.
    Exactly cross-engine because the probes are binary fractions
    (0.25/0.5/0.75 ⇒ exact interpolation weights) over integer-valued
    quantities: every interpolation is exact double arithmetic.  At
    100 TB swap in approx_percentile (t-digest sketch, mergeable,
    one pass) — same API shape, engine-specific values."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "join_full_outer_nation_activity",
    oracle="""
        WITH cust AS (
            SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY c_nationkey
        ),
        supp AS (
            SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp
            FROM supplier GROUP BY s_nationkey
        )
        SELECT coalesce(cust.nk, supp.nk)      AS nationkey,
               coalesce(n_cust, 0)             AS n_customers,
               coalesce(n_supp, 0)             AS n_suppliers,
               (cust.nk IS NULL)               AS suppliers_only,
               (supp.nk IS NULL)               AS customers_only
        FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the rest of the surface
    doesn't exercise): per-nation customer vs supplier presence —
    rows survive from EITHER side, nulls mark the absent one.  Spark
    plans full-outer as sort-merge (no broadcast variant exists);
    both inputs pre-aggregate to nation cardinality first, so the
    join is dimension-sized regardless of fact volume."""
    t = Tables(spark, sf_dir)
    cust = t.customer.groupBy(
        F.col("c_nationkey").alias("nk")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
    supp = t.supplier.groupBy(
        F.col("s_nationkey").alias("nk")
    ).agg(F.count(F.lit(1)).alias("n_supp"))
    j = cust.alias("c").join(
        supp.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_suppliers"),
        F.col("c.nk").isNull().alias("suppliers_only"),
        F.col("s.nk").isNull().alias("customers_only"),
    )


@query(
    "agg_histogram",
    oracle="""
        SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
               CAST(floor(o_totalprice / 50000.0) * 50000 AS DOUBLE)
                 AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2)
                    AS DOUBLE) AS bucket_total
        FROM orders
        GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket shape, emulated with floor
    division so both engines compute identical bucket ids — a single
    IEEE division each).  One scan + one shuffle over ≤ #buckets
    groups; the distribution-profiling aggregate behind every data
    dashboard."""
    from ..functions.agg import dsum, money

    t = Tables(spark, sf_dir)
    bucket = F.floor(F.col("o_totalprice") / 50000.0)
    return (
        t.orders.select(
            bucket.alias("bucket"),
            (bucket * 50000).cast("double").alias("bucket_lo"),
            money(F.col("o_totalprice")).alias("price_dec"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("price_dec"), "bucket_total"),
        )
    )


# Deterministic argmax: DuckDB's arg_max/arg_min take only scalar
# ordering keys, so the (price, orderkey) tie-break is packed into one
# ordered BIGINT — cents * 1e9 + key — evaluated identically by both
# engines (price < 10^7 dollars, orderkey < 10^9 at any tested SF).
# Cents go through the exact DECIMAL(14,2) cast: a raw CAST(x*100 AS
# BIGINT) diverges cross-engine on IEEE products just below the integer
# (Spark truncates, DuckDB rounds).
_ARGMAX_ENC = (
    "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
    " * 1000000000 + o_orderkey"
)


@query(
    "agg_argmax",
    oracle=f"""
        SELECT o_orderpriority,
               arg_max(o_orderkey, {_ARGMAX_ENC}) AS max_price_order,
               arg_min(o_orderkey, {_ARGMAX_ENC}) AS min_price_order,
               CAST(max(o_totalprice) AS DOUBLE) AS max_price,
               CAST(min(o_totalprice) AS DOUBLE) AS min_price
        FROM orders GROUP BY o_orderpriority
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (``max_by``/``min_by``): the identity
    of the extreme row per group, not just its value — one hash
    aggregate instead of the self-join-on-max workaround (q15's shape).
    Ties broken deterministically by packing (value, key) into one
    ordered BIGINT, since the oracle's arg_max lacks composite keys."""
    t = Tables(spark, sf_dir)
    enc = (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast(
        "long"
    ) * F.lit(1_000_000_000) + F.col("o_orderkey")
    return t.orders.groupBy("o_orderpriority").agg(
        F.max_by(F.col("o_orderkey"), enc).alias("max_price_order"),
        F.min_by(F.col("o_orderkey"), enc).alias("min_price_order"),
        F.max(F.col("o_totalprice")).cast("double").alias("max_price"),
        F.min(F.col("o_totalprice")).cast("double").alias("min_price"),
    )


@query(
    "window_distribution",
    oracle="""
        SELECT o_orderpriority, o_orderkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cume,
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-02-01'
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank ((rank−1)/(n−1))
    and cume_dist (rows ≤ current / n): the percentile-position
    analytics the rank family doesn't cover.  Both are exact integer
    ratios evaluated in one IEEE division, so doubles agree
    cross-engine (rounded 6 for display parity).  Ties broken by
    order key → fully deterministic."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "agg_unpivot_metrics",
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS DOUBLE)                    AS n_orders,
                   CAST(count(DISTINCT o_custkey) AS DOUBLE)   AS n_customers,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE)                             AS revenue
            FROM orders GROUP BY 1
        )
        SELECT o_orderpriority, metric, value
        FROM wide
        UNPIVOT (value FOR metric IN (n_orders, n_customers, revenue))
    """,
)
def agg_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (the inverse of agg_pivot): a per-priority
    metrics row melts into (metric, value) pairs via Spark's native
    ``unpivot`` (STACK codegen, row-local — no shuffle beyond the
    aggregation that built the wide frame).  Revenue sums through
    exact decimals before the final double cast (functions/agg.py
    recipe), so all three metrics hash-match as doubles."""
    t = Tables(spark, sf_dir)
    wide = t.orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "n_customers", "revenue"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_salted_flag_totals",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS gross
        FROM lineitem
        GROUP BY 1, 2
    """,
)
def agg_salted_flag_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation machinery under the driver gate: two-stage
    salted aggregation (operators/skew.py salted_aggregate — stage 1
    groups on keys+salt so one hot key spreads over n_salts reducers,
    stage 2 merges algebraic partials) must equal the plain GROUP BY.
    Sums run through exact decimals, so partial-merge order cannot
    drift the doubles (functions/agg.py recipe).  lineitem's
    returnflag/linestatus is the engine's most skewed natural key
    (3×2 groups over the whole fact table — precisely the shape where
    per-key reducers saturate at 100 TB)."""
    from ..operators.skew import salted_aggregate

    t = Tables(spark, sf_dir)
    df = t.lineitem.withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        df,
        ["l_returnflag", "l_linestatus"],
        {
            "n_rows": ("l_orderkey", "count"),
            "gross_dec": ("price_dec", "sum"),
        },
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("gross_dec").cast("double").alias("gross"),
    )


@query(
    "window_ntile_quartiles",
    oracle="""
        SELECT o_orderpriority, o_orderkey,
               CAST(ntile(4) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
               ) AS INTEGER) AS quartile
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-02-01'
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing — equal-frequency quartile assignment per
    priority (the price-band segmentation the distribution windows
    rank continuously).  NTILE's bucket rule (first n%4 buckets get
    the extra row) is spec-identical across engines; ties broken by
    order key → fully deterministic, integer output → bit-exact."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority,
               max_by(o_orderstatus,
                      n * 1000 + (999 - ascii(o_orderstatus)))
                 AS mode_status,
               CAST(max(n) AS BIGINT) AS mode_n
        FROM c GROUP BY 1 ORDER BY 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical MODE per group — the most frequent order status per
    priority, computed as count-then-argmax (two tiny aggregations;
    no sort, no window over the fact table).  Ties break toward the
    LOWEST status byte via the packed count·1000+(999−ascii) argmax
    key (agg_argmax's single-BIGINT recipe: the oracle's max_by lacks
    composite keys), so both engines pick the identical mode."""
    t = Tables(spark, sf_dir)
    c = t.orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.max_by(
                F.col("o_orderstatus"),
                F.col("n") * 1000
                + (F.lit(999) - F.ascii("o_orderstatus")),
            ).alias("mode_status"),
            F.max("n").alias("mode_n"),
        )
        .orderBy("o_orderpriority")
    )
