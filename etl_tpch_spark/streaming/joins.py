"""Stream-stream joins: the live form of the flagship's orders⋈lineitem.

The reference never joins two live feeds — its daily query reads fully
materialized Delta tables (reduce.py:43-64).  Spark can join the two
micro-batch streams directly: each side buffers rows in the state store
until the other side's matches arrive, with watermarks + a time-range
join condition bounding how long state is kept.

State-size contract (the thing to get right at 100 TB/day):

- both inputs carry a watermark (``withWatermark``);
- the join condition includes an event-time range tying the two sides
  (here: a lineitem ships within ``horizon`` of its order) — Spark
  derives each side's state eviction from watermark + range;
- without the range bound the state store grows unboundedly and the
  join is still *allowed* — it just never evicts; always give one.

Inner joins emit in append mode as soon as a match lands.  Outer joins
(``how="left_outer"``) additionally emit null-padded rows for
unmatched left rows — but only once the JOINT watermark (min of both
sides) passes the row's eviction time, so a drained stream can hold
back the tail's unmatched rows until a later trigger run advances the
watermark (tests/test_streaming.py stages a sentinel batch to pin
exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_orders_lineitem_join(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    watermark: str = "30 days",
    horizon_days: int = 4,
    how: str = "inner",
) -> DataFrame:
    """Join live orders and lineitem streams on order key with an
    event-time range bound (LIVE schema: string uuid keys,
    ``o_order_time``/``l_ship_time``; ship within ``horizon_days`` of
    order time, per the generator's semantics data.py:96-108).
    ``how="left_outer"`` keeps orders that never ship a line (the live
    unshipped-orders feed): Spark pads them with nulls once the joint
    watermark proves no match can still arrive."""
    o = orders.withWatermark("o_order_time", watermark).select(
        "o_orderkey", "o_custkey", "o_order_time", "o_orderpriority"
    )
    l = lineitem.withWatermark("l_ship_time", watermark).select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_ship_time"
    )
    return o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_ship_time") >= F.col("o_order_time"))
        & (
            F.col("l_ship_time")
            <= F.col("o_order_time") + F.expr(f"INTERVAL {horizon_days} DAYS")
        ),
        how,
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "o_order_time",
        "l_ship_time",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    *,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live stream (user → account, product → category, …).

    Stateless — unlike stream-stream joins there is no buffering: each
    micro-batch joins against the *current* snapshot of the static side,
    so dimension updates are picked up on the next batch (slowly-
    changing dims come for free at batch granularity).  Broadcasting
    the dim keeps the stream side shuffle-free — at 100 TB/day of
    events with a GB-scale dim table, this is the only plan that keeps
    up; set ``broadcast_dim=False`` only when the dim is fact-sized."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
