"""SQL-API surface: the SAME ANSI string runs on spark.sql AND DuckDB.

Everything else in the engine is DataFrame-first with a DuckDB oracle
as an independent re-implementation.  These entries close the loop on
the ``spark.sql`` entry point (SURVEY.md §7 Milestone 3): the query IS
its own oracle — one ANSI-compatible string executed by both engines
over identically-named views, so any SQL-surface divergence (parser,
type coercion, function semantics) fails the hash check directly.

Restricted to the ANSI intersection: no DuckDB list_* functions, no
Spark-only syntax.  Timestamp literals, CASE, CTEs, window functions
and decimal casts are all in the common subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


_SQL_REVENUE_BY_STATUS = """
    SELECT l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(3,2))
                             - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_linestatus
"""


@query("sql_api_revenue_by_status", oracle=_SQL_REVENUE_BY_STATUS)
def sql_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql aggregate — the registered SQL string is executed
    verbatim by both engines."""
    return _run(spark, sf_dir, _SQL_REVENUE_BY_STATUS)


_SQL_TOP_CUSTOMERS = """
    WITH order_totals AS (
        SELECT o_custkey,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2)
                    AS DOUBLE) AS total_spent,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, c_mktsegment, total_spent, n_orders
    FROM customer
    JOIN order_totals ON c_custkey = o_custkey
    ORDER BY total_spent DESC, c_custkey
    LIMIT 25
"""


@query("sql_api_top_customers", oracle=_SQL_TOP_CUSTOMERS)
def sql_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql CTE + join + top-k, shared string with the oracle."""
    return _run(spark, sf_dir, _SQL_TOP_CUSTOMERS)


_SQL_PRIORITY_WINDOW = """
    SELECT o_orderpriority,
           o_orderkey,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT o_orderpriority,
               o_orderkey,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders
    ) t
    WHERE rnk <= 5
"""


@query("sql_api_priority_window", oracle=_SQL_PRIORITY_WINDOW)
def sql_priority_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql window function, shared string with the oracle."""
    return _run(spark, sf_dir, _SQL_PRIORITY_WINDOW)


@query(
    "catalog_list_tables",
    oracle="""
        SELECT table_name
        FROM information_schema.tables
        WHERE table_name IN
            ('region','nation','customer','supplier','part',
             'orders','lineitem','events','documents','embeddings')
        ORDER BY table_name
    """,
)
def catalog_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog scan (SURVEY.md S2 — reference data.py:56-60 lists
    information_schema.tables): register the sf_dir tables as views,
    then read them back from spark.catalog.listTables — hash-matched
    against DuckDB's information_schema over the same views."""
    from ..schemas import TABLE_NAMES

    register_views(spark, sf_dir)
    names = sorted(
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and t.name in TABLE_NAMES
    )
    from ..exprs import values_frame

    return values_frame(
        spark, [(n,) for n in names], "table_name string"
    )


_SQL_QUARTILES = """
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
             AS median_qty,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)
             AS p75_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("sql_api_quartiles", oracle=_SQL_QUARTILES)
def sql_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql ordered-set aggregate (percentile_cont WITHIN GROUP),
    shared string with the oracle — exact because the probes are binary
    fractions over integer-valued quantities (see agg_percentiles)."""
    return _run(spark, sf_dir, _SQL_QUARTILES)


_SQL_EXISTS = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
"""


@query("sql_api_exists_subquery", oracle=_SQL_EXISTS)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql correlated EXISTS subquery, shared string with the
    oracle — Catalyst decorrelates to a left-semi hash join (the same
    rewrite q4 hand-writes in the DataFrame API)."""
    return _run(spark, sf_dir, _SQL_EXISTS)
