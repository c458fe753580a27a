"""Column-profiling query registration (pipeline/stats.py surface).

The profile IS the statistics payload ANALYZE computes — registering it
as a hash-checked query proves the stats the optimizer would consume
are exactly right, not just present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Tables
from ..pipeline.stats import column_profile
from ..registry import query

_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def _one(col: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               CAST(count(*) AS BIGINT)          AS n_rows,
               CAST(count({col}) AS BIGINT)      AS n_not_null,
               CAST(min({col}) AS DOUBLE)        AS min_value,
               CAST(max({col}) AS DOUBLE)        AS max_value,
               CAST(count(DISTINCT {col}) AS BIGINT) AS ndv
        FROM orders"""


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(_one(c) for c in _COLS),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan (pipeline/stats.py column_profile):
    count/nulls/min/max/exact-NDV per column, unpivoted from a single
    aggregate row with stack().  The same numbers ANALYZE TABLE ... FOR
    COLUMNS feeds the CBO; the oracle recomputes them per column."""
    t = Tables(spark, sf_dir)
    return column_profile(t.orders, _COLS)
