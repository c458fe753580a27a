"""Persisted HLL register index (pipeline/hll_index.py): merged tick
estimates equal the one-shot sketch bit-for-bit, replayed ticks are
no-ops, and fold() compacts without changing a single estimate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.hll_index import HllIndex
from etl_tpch_spark.queries.sketches import events_hll_daily_users


def _events_halves(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    )


def test_merged_ticks_equal_one_shot_sketch(spark, sf_dir, tmp_path):
    """Two ticks over disjoint halves of the event log produce the
    SAME per-day estimates as the batch query over everything —
    register max is associative, so this is equality, not tolerance."""
    a, b = _events_halves(spark, sf_dir)
    idx = HllIndex(str(tmp_path / "hll"))
    idx.tick(a, batch_id="day-a")
    idx.tick(b, batch_id="day-b")
    got = [tuple(r) for r in idx.estimate(spark).collect()]
    ref = [
        (r["day"], r["est_users"])
        for r in events_hll_daily_users(spark, sf_dir)
        .select("day", "est_users")
        .orderBy("day")
        .collect()
    ]
    assert got == ref


def test_tick_replay_is_noop(spark, sf_dir, tmp_path):
    a, _ = _events_halves(spark, sf_dir)
    idx = HllIndex(str(tmp_path / "hll"))
    v1 = idx.tick(a, batch_id="crawl-0")
    v2 = idx.tick(a, batch_id="crawl-0")  # foreachBatch replay
    assert v1 == v2 == 1
    assert idx.table.latest_version() == 1


def test_fold_compacts_without_changing_estimates(
    spark, sf_dir, tmp_path
):
    a, b = _events_halves(spark, sf_dir)
    idx = HllIndex(str(tmp_path / "hll"))
    idx.tick(a, batch_id="t0")
    idx.tick(b, batch_id="t1")
    before = [tuple(r) for r in idx.estimate(spark).collect()]
    rows_before = idx.table.read(spark).count()
    idx.fold(spark)
    after = [tuple(r) for r in idx.estimate(spark).collect()]
    rows_after = idx.table.read(spark).count()
    assert after == before
    assert rows_after <= rows_before
    # one row per (day, register) exactly
    merged = idx.table.read(spark)
    assert merged.count() == merged.select("day", "reg").distinct().count()


def test_estimate_never_reads_events(spark, sf_dir, tmp_path):
    """The running estimate touches ONLY the index parquet — the plan
    scans no event files (the O(new)-per-tick claim's read side)."""
    a, b = _events_halves(spark, sf_dir)
    idx = HllIndex(str(tmp_path / "hll"))
    idx.tick(a, batch_id="t0")
    idx.tick(b, batch_id="t1")
    est = idx.estimate(spark)
    assert all("events.parquet" not in f for f in est.inputFiles())
    assert len(est.inputFiles()) > 0
