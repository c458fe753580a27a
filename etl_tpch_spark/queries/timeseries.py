"""Time-series analytics over the ``events`` table.

The reference's event feed is a wall-clock micro-batch stream
(data.py:104-107 stamps event times per 15-min cycle); any consumer
dashboarding that feed needs the standard time-series toolkit the
relational surface lacks: densification (gap-fill), last-observation-
carried-forward interpolation, and interval-range moving windows.
These are the batch forms; the hourly-rollup inputs are the same
``date_trunc`` buckets the streaming ``window()`` aggregates emit.

Scale notes (100 TB): the only full-data pass is the hourly rollup —
one partial+final hash aggregate.  The dense grid is ``hours ×
event_types`` rows (thousands, data-independent of event count), built
with ``sequence()``+``explode`` from a 1-row bounds aggregate and
joined broadcast; gap-fill cost is O(grid), not O(events).

Determinism: counts are exact longs; value sums go through the exact
decimal path (functions/agg.py); LOCF carries a raw 2-decimal double
(no re-aggregation) — all bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.agg import money
from ..registry import query

_HOURLY_SQL = """
        SELECT date_trunc('hour', ts) AS hr, event_type,
               count(*) AS n,
               sum(CAST(value AS DECIMAL(12,2))) AS total
        FROM events GROUP BY 1, 2
"""

_GRID_SQL = """
        SELECT g.hr, et.event_type
        FROM (SELECT unnest(generate_series(
                  (SELECT min(date_trunc('hour', ts)) FROM events),
                  (SELECT max(date_trunc('hour', ts)) FROM events),
                  INTERVAL '1 hour')) AS hr) g
        CROSS JOIN (SELECT DISTINCT event_type FROM events) et
"""


def _hourly(events: DataFrame) -> DataFrame:
    """Hourly rollup per event_type — the one full-data aggregate."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money(F.col("value"))).alias("total"),
    )


def _dense_grid(events: DataFrame) -> DataFrame:
    """Dense (hour × event_type) grid spanning the observed range.

    ``sequence`` explodes from a single global min/max row — the grid is
    data-size-independent (hours × types), so the cross join is a
    broadcast of two tiny relations, never a shuffle of events."""
    bounds = events.agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("lo"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("hr")
    )
    return hours.crossJoin(events.select("event_type").distinct())


@query(
    "ts_gapfill_hourly",
    oracle=f"""
        WITH hourly AS ({_HOURLY_SQL}),
        grid AS ({_GRID_SQL})
        SELECT grid.hr, grid.event_type,
               CAST(coalesce(hourly.n, 0) AS BIGINT) AS n,
               CAST(round(coalesce(hourly.total, 0), 2) AS DOUBLE)
                 AS total_value
        FROM grid LEFT JOIN hourly
          ON grid.hr = hourly.hr AND grid.event_type = hourly.event_type
    """,
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type: densify the hourly
    rollup onto the full observed hour range (``sequence``+``explode``
    grid), zero-filling empty buckets — the resample step every
    time-series consumer needs before charting/joining, which a plain
    GROUP BY cannot produce (absent groups emit no row)."""
    t = Tables(spark, sf_dir)
    hourly = _hourly(t.events)
    grid = _dense_grid(t.events)
    return grid.join(hourly, ["hr", "event_type"], "left").select(
        "hr",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.round(
            F.coalesce(F.col("total"), F.lit(0).cast("decimal(12,2)")), 2
        )
        .cast("double")
        .alias("total_value"),
    )


# Deterministic argmax encoding: 2-decimal value in cents, tie-broken by
# event_id, packed into one ordered BIGINT (DuckDB's arg_max cannot take
# a composite ordering key; the same encoding runs on both engines).
# Cents are recovered through the exact DECIMAL(12,2) cast — a raw
# CAST(value*100 AS BIGINT) is WRONG cross-engine: ~6% of the IEEE
# products land just below the integer, where Spark's double→long
# truncates and DuckDB's rounds, off-by-one-cent encodings that can
# flip the argmax winner when two candidates are a cent apart.
_ENC = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) * 1000000000 + event_id"


@query(
    "ts_locf_hourly",
    oracle=f"""
        WITH latest AS (
            SELECT date_trunc('hour', ts) AS hr, event_type,
                   arg_max(value, {_ENC}) AS v
            FROM events GROUP BY 1, 2
        ),
        grid AS ({_GRID_SQL})
        SELECT grid.hr, grid.event_type,
               (latest.v IS NULL) AS filled,
               last_value(latest.v IGNORE NULLS) OVER (
                   PARTITION BY grid.event_type ORDER BY grid.hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_locf
        FROM grid LEFT JOIN latest
          ON grid.hr = latest.hr AND grid.event_type = latest.event_type
    """,
)
def ts_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward interpolation: each hour carries
    the latest observed ``value`` per event type, gaps inherit the
    previous hour's observation (``last(..., ignorenulls)`` over the
    densified grid).  The per-hour "latest" is a deterministic argmax —
    (value, event_id) packed into one ordered BIGINT because the DuckDB
    twin's ``arg_max`` takes only scalar ordering keys.  One shuffle for
    the rollup, one tiny window over the grid."""
    t = Tables(spark, sf_dir)
    enc = (money(F.col("value")) * 100).cast("long") * F.lit(
        1_000_000_000
    ) + F.col("event_id")
    latest = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), F.col("event_type")
    ).agg(F.max_by(F.col("value"), enc).alias("v"))
    grid = _dense_grid(t.events)
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.join(latest, ["hr", "event_type"], "left").select(
        "hr",
        "event_type",
        F.col("v").isNull().alias("filled"),
        F.last(F.col("v"), ignorenulls=True).over(w).alias("value_locf"),
    )


@query(
    "ts_moving_window_range",
    oracle=f"""
        WITH hourly AS ({_HOURLY_SQL})
        SELECT hr, event_type, n,
               CAST(sum(n) OVER trailing3h AS BIGINT) AS n_3h,
               CAST(sum(total) OVER trailing3h AS DOUBLE)
                     / sum(n) OVER trailing3h AS avg_value_3h
        FROM hourly
        WINDOW trailing3h AS (
            PARTITION BY event_type ORDER BY hr
            RANGE BETWEEN INTERVAL '2 hours' PRECEDING AND CURRENT ROW)
    """,
)
def ts_moving_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour moving aggregate with a RANGE (interval) frame —
    unlike a ROWS frame, missing hours correctly shrink the window, so
    the rollup needs no densification first.  Spark expresses the
    interval frame as ``rangeBetween`` over epoch seconds (same frame
    the SQL twin states as INTERVAL).  Sum/count stay exact (long +
    decimal); the average is one IEEE division."""
    t = Tables(spark, sf_dir)
    hourly = _hourly(t.events)
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp(F.col("hr")))
        .rangeBetween(-7200, 0)
    )
    return hourly.select(
        "hr",
        "event_type",
        "n",
        F.sum("n").over(w).alias("n_3h"),
        (F.sum("total").over(w).cast("double") / F.sum("n").over(w)).alias(
            "avg_value_3h"
        ),
    )


@query(
    "events_rolling_active_users",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        win AS (
            SELECT user_id,
                   CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                        CAST(day AS TIMESTAMP) + INTERVAL '6 days',
                        INTERVAL '1 day')) AS DATE) AS wday
            FROM ud
        ),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS wday FROM events)
        SELECT win.wday, CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
        FROM win JOIN days ON win.wday = days.wday
        GROUP BY 1
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the metric every product
    dashboard needs and no window frame can give (COUNT DISTINCT does
    not decompose over sliding frames).  The scalable decomposition:
    dedup to (user, day), explode each activity onto the ≤7 window-days
    it contributes to, count distinct per window-day.  Data expansion
    is bounded ×7 of the *deduped daily* relation (tiny vs raw events);
    two shuffles (dedup, final count-distinct).  Trailing windows past
    the last observed day are pruned by the semi-join against real
    days."""
    t = Tables(spark, sf_dir)
    ud = t.events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    win = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), 6), F.expr("interval 1 day")
            )
        ).alias("wday"),
    )
    days = t.events.select(F.to_date("ts").alias("wday")).distinct()
    return (
        win.join(days, "wday")
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
        WITH c AS (
            SELECT event_type, event_id,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
            FROM events
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS sc,
                   CAST(sum(c * c) AS BIGINT) AS sc2
            FROM c GROUP BY 1
        )
        SELECT c.event_type, s.n,
               CAST(sum(CASE WHEN (c.c * s.n - s.sc) * (c.c * s.n - s.sc)
                                  > 9 * (s.n * s.sc2 - s.sc * s.sc)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
               CAST(s.sc AS DOUBLE) / (100.0 * s.n) AS mean_value
        FROM c JOIN s ON c.event_type = s.event_type
        GROUP BY c.event_type, s.n, s.sc
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type (|value − μ| > 3σ),
    entirely in integer arithmetic: with cents c, n, Σc, Σc², the test
    |z| > 3 is equivalent to (c·n − Σc)² > 9·(n·Σc² − (Σc)²) — exact
    BIGINTs on both engines, no float σ, no rounding boundary.  Plan:
    one tiny per-type aggregate, broadcast back over a second scan, one
    final aggregate — two scans instead of shuffling the whole fact
    table onto a handful of event_type keys (the skew trap).  At
    extreme scale the products approach 2^63 — upgrade to DECIMAL(38,0)
    / HUGEINT then; cents ≤ 10^4 and rows-per-type ≤ 10^9 stay safe."""
    t = Tables(spark, sf_dir)
    c = t.events.select(
        "event_type",
        (money(F.col("value")) * 100).cast("long").alias("c"),
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    j = c.join(F.broadcast(s), "event_type")
    dev = F.col("c") * F.col("n") - F.col("sc")
    flag = (dev * dev) > 9 * (
        F.col("n") * F.col("sc2") - F.col("sc") * F.col("sc")
    )
    return j.groupBy("event_type", "n", "sc").agg(
        F.sum(F.when(flag, 1).otherwise(0)).alias("n_anomalies"),
        (F.col("sc").cast("double") / (100.0 * F.col("n"))).alias(
            "mean_value"
        ),
    ).select("event_type", "n", "n_anomalies", "mean_value")
