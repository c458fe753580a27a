"""Streaming HLL ticks (streaming/hll_index.py): event files →
checkpointed stream → one register-fold per micro-batch; merged
estimates equal the one-shot batch sketch, replays are no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.hll_index import HllIndex
from etl_tpch_spark.queries.sketches import events_hll_daily_users
from etl_tpch_spark.streaming.hll_index import stream_hll_ticks


def _stage(spark, events, events_dir: str, day: int) -> None:
    events.select("event_id", "ts", "user_id").coalesce(1).write.mode(
        "overwrite"
    ).json(os.path.join(events_dir, f"batch{day}.json"))


def _ref(spark, sf_dir):
    return [
        (r["day"], r["est_users"])
        for r in events_hll_daily_users(spark, sf_dir)
        .select("day", "est_users")
        .orderBy("day")
        .collect()
    ]


def test_stream_ticks_match_batch_sketch(spark, sf_dir, tmp_path):
    """Two staged event batches drained through stream ticks produce
    per-day estimates EQUAL to the batch query over all events."""
    ev = load_table(spark, sf_dir, "events")
    stage_dir = str(tmp_path / "events")
    idx_path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    _stage(spark, ev.filter(F.col("event_id") % 2 == 0), stage_dir, 1)
    stream_hll_ticks(spark, stage_dir, idx_path, ckpt)
    _stage(spark, ev.filter(F.col("event_id") % 2 == 1), stage_dir, 2)
    stream_hll_ticks(spark, stage_dir, idx_path, ckpt)

    got = [
        tuple(r) for r in HllIndex(idx_path).estimate(spark).collect()
    ]
    assert got == _ref(spark, sf_dir)


def test_stream_replay_leaves_estimates_unchanged(
    spark, sf_dir, tmp_path
):
    """Restarting the drain with the same checkpoint re-reads nothing;
    even wiping the checkpoint (full logical replay) leaves every
    estimate unchanged — register folding is idempotent AND the epoch
    batch ids make the index appends no-ops."""
    ev = load_table(spark, sf_dir, "events")
    stage_dir = str(tmp_path / "events")
    idx_path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, ev, stage_dir, 1)
    stream_hll_ticks(spark, stage_dir, idx_path, ckpt)
    idx = HllIndex(idx_path)
    v = idx.table.latest_version()
    before = [tuple(r) for r in idx.estimate(spark).collect()]

    stream_hll_ticks(spark, stage_dir, idx_path, ckpt)  # checkpoint no-op
    assert idx.table.latest_version() == v

    import shutil

    shutil.rmtree(ckpt)  # force full replay with the same epoch ids
    stream_hll_ticks(spark, stage_dir, idx_path, ckpt)
    assert idx.table.latest_version() == v  # batch-id no-op
    assert [tuple(r) for r in idx.estimate(spark).collect()] == before


def test_fold_threshold_compacts_index(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    stage_dir = str(tmp_path / "events")
    idx_path = str(tmp_path / "idx")
    _stage(spark, ev.filter(F.col("event_id") % 3 == 0), stage_dir, 1)
    _stage(spark, ev.filter(F.col("event_id") % 3 == 1), stage_dir, 2)
    stream_hll_ticks(
        spark, stage_dir, idx_path, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, fold_over_files=1,
    )
    idx = HllIndex(idx_path)
    merged = idx.table.read(spark)
    # folded: one row per (day, register)
    assert merged.count() == merged.select("day", "reg").distinct().count()
