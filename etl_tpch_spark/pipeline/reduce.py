"""Reduce stage: the flagship query over the *live* processed tables.

Reference semantics (pipeline/reduce.py:24-86): daily, for each of the 5
market segments, compute "unshipped orders by revenue" (TPC-H Q3
variant) over the Delta tables and write one snappy parquet per segment
to ``results/`` (SURVEY.md §3.1, S8).

This module is the live-schema twin of ``queries/flagship.py`` (which
targets driver testdata): the processed tables use the reference's
renamed columns (``o_order_time``/``l_ship_time``, data.py:100-108) and
*string* uuid order keys (data.py:74-93) — join logic is identical
because Spark equi-joins are key-type agnostic (SURVEY.md §7 risk c).
Column naming is resolved at runtime so the same function also accepts
testdata-named tables.

Scale notes: identical plan shape to queries/flagship.py — broadcast the
filtered customer dim, shuffle-join the two pre-filtered facts, partial
agg before the final top-k (TakeOrderedAndProject).  The cutoff is an
explicit parameter; the reference's ``pd.Timestamp.now()``
(reduce.py:56) is the caller's choice, not baked in.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def _col(df: DataFrame, *candidates: str) -> str:
    for c in candidates:
        if c in df.columns:
            return c
    raise ValueError(f"none of {candidates} in {df.columns}")


def unshipped_orders_live(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    *,
    segment: str,
    cutoff: datetime | str,
    k: int = 50,
) -> DataFrame:
    """Reference reduce.py:43-78 against live-schema DataFrames.

    Output columns follow the reference result (reduce.py:72-74):
    ``l_orderkey, revenue, <order time>, o_orderpriority``.
    """
    o_time = _col(orders, "o_order_time", "o_orderdate")
    l_time = _col(lineitem, "l_ship_time", "l_shipdate")
    cut = F.lit(cutoff).cast("timestamp")

    fcust = customer.filter(
        F.col("c_mktsegment") == segment.upper()
    ).select("c_custkey")
    forders = orders.filter(F.col(o_time) < cut).select(
        "o_orderkey", "o_custkey", o_time, "o_orderpriority"
    )
    fline = lineitem.filter(F.col(l_time) > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        forders.join(F.broadcast(fcust), forders.o_custkey == fcust.c_custkey)
        .join(fline, forders.o_orderkey == fline.l_orderkey)
        .withColumn(
            "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
        .groupBy("l_orderkey", o_time, "o_orderpriority")
        .agg(F.sum("revenue").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
        .select("l_orderkey", "revenue", o_time, "o_orderpriority")
    )


def query_reduce(
    spark: SparkSession,
    processed_dir: str,
    results_dir: str,
    *,
    cutoff: datetime | str,
    segments: tuple[str, ...] = SEGMENTS,
    k: int = 50,
    fmt: str = "parquet",
) -> dict[str, str]:
    """Flow ``query_reduce`` (reduce.py:81-86): the segment loop, one
    snappy parquet result per segment.  Returns {segment: result_path}.

    The loop is intentional parity with the reference (5 separate gold
    outputs); the single-pass window form is
    ``queries.flagship.top_unshipped_per_segment``.
    """
    load = lambda t: spark.read.format(fmt).load(  # noqa: E731
        os.path.join(processed_dir, t)
    )
    orders, lineitem, customer = load("orders"), load("lineitem"), load("customer")
    out: dict[str, str] = {}
    for seg in segments:
        res = unshipped_orders_live(
            orders, lineitem, customer, segment=seg, cutoff=cutoff, k=k
        )
        path = os.path.join(results_dir, f"{seg.lower()}.snappy.parquet")
        # k≈50 rows → one file, like the reference's single parquet
        # (reduce.py:76-78); snappy is Spark's default parquet codec.
        res.coalesce(1).write.mode("overwrite").parquet(path)
        out[seg] = path
    return out
