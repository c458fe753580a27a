"""Serving/display layer — the engine-side equivalent of the
reference's Streamlit dashboard data prep (dashboard.py:40-69).

The reference reads each segment's result parquet and formats it for
humans: zero-padded order ids (``f"{x:09}"``, dashboard.py:46),
2-decimal rounding (dashboard.py:47), ``$``-prefixed thousands-grouped
revenue and MM/DD/YYYY dates (dashboard.py:58-69).  Here that's a
DataFrame → DataFrame transform (display strings computed JVM-side
with ``format_string``/``format_number``/``date_format``), so the
"dashboard" can be any BI tool reading the gold zone — formatting
stays in the engine where it is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_for_display(results: DataFrame) -> DataFrame:
    """reference dashboard.py:40-56 ``prepare_data``: order key
    zero-padded to 9, revenue rounded then ``$``-grouped, order date
    MM/DD/YYYY."""
    return results.select(
        F.format_string("%09d", F.col("l_orderkey")).alias("order_id"),
        F.concat(
            F.lit("$"), F.format_number(F.round("revenue", 2), 2)
        ).alias("revenue_display"),
        F.date_format("o_orderdate", "MM/dd/yyyy").alias("order_date"),
        F.col("o_orderpriority").alias("priority"),
    )
