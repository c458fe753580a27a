"""Event-time windowed aggregations with watermarks (SURVEY.md T2/T5).

The reference's only notion of event-time windowing is "query at ``now``
sees whatever was ingested" (reduce.py:56); late data is unhandled (T5).
These operators add the real thing: tumbling / sliding / session windows
over the ``events`` table's ``ts`` column, with a watermark bounding
state retention.

Each function takes a plain DataFrame and returns a plain DataFrame, so
one definition serves both engines: applied to ``spark.read`` it is a
batch group-by; applied to ``spark.readStream`` it becomes a stateful
streaming aggregation whose state is purged once the watermark passes a
window's end.  (The batch twins registered with the driver oracle live
in ``queries/events.py``; tests assert stream ≡ batch.)

At scale: watermark delay directly bounds state-store size — with a
10-minute watermark and 1-minute windows, state holds ~11 minutes of
keys regardless of total stream volume.  Session windows merge on
overlap per key, so skewed keys (one chatty user) grow a single session
rather than unbounded state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA


def streaming_events_source(
    spark: SparkSession, events_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of the events table (parquet dir written with
    µs timestamps; see catalog.load_table for the testdata nanos case).
    """
    return (
        spark.readStream.schema(TESTDATA["events"])
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )


def _wm(events: DataFrame, watermark: str | None) -> DataFrame:
    return events.withWatermark("ts", watermark) if watermark else events


def tumbling_window_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per event-type counts in non-overlapping event-time windows.

    ``watermark=None`` skips late-data bounding — required when the
    source is not (even roughly) time-ordered, e.g. replaying an
    unsorted file backlog in complete mode."""
    return (
        _wm(events, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sliding_window_avg(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide windows."""
    return (
        _wm(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


def session_window_stats(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-user sessions: windows extend while events arrive within
    ``gap`` of the last one (dynamic-length, merged by Spark's
    session_window operator)."""
    return (
        _wm(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_to_memory_sink(
    df: DataFrame, name: str, *, checkpoint_dir: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a finite streaming aggregation into an in-memory table and
    return it as a batch DataFrame (test/debug harness — a production
    sink would be parquet/delta/kafka)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
