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
    MM/DD/YYYY.  Accepts both result namings: the static-table DATE
    ``o_orderdate`` and the live pipeline's rescaled TIMESTAMP
    ``o_order_time`` (pipeline/generate.py)."""
    date_col = (
        "o_orderdate" if "o_orderdate" in results.columns else "o_order_time"
    )
    key_type = results.schema["l_orderkey"].dataType.simpleString()
    order_id = (
        F.format_string("%09d", F.col("l_orderkey"))
        if key_type in ("int", "bigint", "smallint")
        # live pipeline keys are uuid strings (generate.py rekey) —
        # already display-ready, zero-padding is a numeric-key concept
        else F.col("l_orderkey").cast("string")
    )
    return results.select(
        order_id.alias("order_id"),
        F.concat(
            F.lit("$"), F.format_number(F.round("revenue", 2), 2)
        ).alias("revenue_display"),
        F.date_format(date_col, "MM/dd/yyyy").alias("order_date"),
        F.col("o_orderpriority").alias("priority"),
    )
