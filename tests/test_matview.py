"""Incremental materialized-view maintenance (pipeline/matview.py):
multi-batch refresh must equal a full recompute, batch_id replay must
be a no-op, the decimal state schema must be a fixed point, and an
interrupted swap must be recoverable from every crash window."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.matview import MaterializedView, Measure

MEASURES = (
    Measure("n_orders", "count"),
    Measure("total_price", "sum", "CAST(o_totalprice AS DECIMAL(18,2))"),
    Measure("max_price", "max", "CAST(o_totalprice AS DECIMAL(18,2))"),
)


def _view(tmp_path) -> MaterializedView:
    return MaterializedView(
        str(tmp_path / "mv"), ("o_orderpriority",), MEASURES
    )


def _batches(spark, sf_dir, n=3):
    orders = load_table(spark, sf_dir, "orders")
    return orders, [
        orders.filter(F.pmod(F.col("o_orderkey"), F.lit(n)) == i)
        for i in range(n)
    ]


def _full_recompute(orders):
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).alias(
            "total_price"
        ),
        F.max(F.expr("CAST(o_totalprice AS DECIMAL(18,2))")).alias(
            "max_price"
        ),
    )


def test_multi_batch_refresh_equals_recompute(spark, sf_dir, tmp_path):
    mv = _view(tmp_path)
    orders, batches = _batches(spark, sf_dir)
    for i, b in enumerate(batches):
        mv.refresh(spark, b, batch_id=f"b{i}")
    got = mv.read(spark)
    want = _full_recompute(orders).select(*[f.name for f in got.schema])
    # decimal fixed point incl. types (nullability differs after the
    # parquet round-trip — not a semantic property of the state)
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in want.schema
    ]
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_batch_replay_is_noop(spark, sf_dir, tmp_path):
    mv = _view(tmp_path)
    _, batches = _batches(spark, sf_dir)
    mv.refresh(spark, batches[0], batch_id="b0")
    before = {tuple(r) for r in mv.read(spark).collect()}
    # replay the SAME batch id twice more — both initial-create replay
    # and incremental replay must be skipped
    mv.refresh(spark, batches[0], batch_id="b0")
    mv.refresh(spark, batches[0], batch_id="b0")
    after = {tuple(r) for r in mv.read(spark).collect()}
    assert before == after
    assert mv.applied_batches() == ["b0"]


def test_schema_fixed_point_across_many_refreshes(spark, sf_dir, tmp_path):
    mv = _view(tmp_path)
    _, batches = _batches(spark, sf_dir, n=4)
    schemas = []
    for i, b in enumerate(batches):
        mv.refresh(spark, b, batch_id=f"b{i}")
        schemas.append(mv.read(spark).schema)
    assert all(s == schemas[0] for s in schemas)  # no decimal widening


def test_recover_from_crash_between_renames(spark, sf_dir, tmp_path):
    """Crash window (a): live dir renamed away, temp not yet renamed in
    → next entry point restores the old state and the batch replays."""
    mv = _view(tmp_path)
    _, batches = _batches(spark, sf_dir)
    mv.refresh(spark, batches[0], batch_id="b0")
    before = {tuple(r) for r in mv.read(spark).collect()}
    # simulate: os.rename(path, old) happened, then the process died
    os.rename(mv.path, mv._old_dir())
    assert not os.path.exists(mv.path)
    assert {tuple(r) for r in mv.read(spark).collect()} == before
    assert mv.applied_batches() == ["b0"]
    # and the interrupted batch replays cleanly afterwards
    mv.refresh(spark, batches[1], batch_id="b1")
    assert mv.applied_batches() == ["b0", "b1"]


def test_recover_from_crash_after_swap(spark, sf_dir, tmp_path):
    """Crash window (b): swap completed but .old cleanup didn't → the
    stale .old is dropped, new state wins."""
    mv = _view(tmp_path)
    _, batches = _batches(spark, sf_dir)
    mv.refresh(spark, batches[0], batch_id="b0")
    shutil.copytree(mv.path, mv._old_dir())  # stale pre-swap snapshot
    mv.refresh(spark, batches[1], batch_id="b1")
    assert not os.path.exists(mv._old_dir())
    assert mv.applied_batches() == ["b0", "b1"]


def test_initial_create_is_atomic_with_marker(spark, sf_dir, tmp_path):
    """The first refresh publishes data and marker with one rename — if
    the state dir exists at all, the marker is inside it."""
    mv = _view(tmp_path)
    _, batches = _batches(spark, sf_dir)
    mv.refresh(spark, batches[0], batch_id="b0")
    assert os.path.exists(os.path.join(mv.path, "_applied_batches.json"))
    assert mv.applied_batches() == ["b0"]


def test_rejects_non_self_describing_format(tmp_path):
    with pytest.raises(ValueError, match="self-describing"):
        MaterializedView(str(tmp_path / "x"), ("k",), MEASURES, fmt="csv")


def test_matview_as_streaming_foreachbatch_sink(
    spark, sf_dir, tmp_path_factory
):
    """The matview as an exactly-once foreachBatch target (mirror of
    the TxTable streaming test): drain a file stream refreshing the
    view per epoch, final state equals a full recompute, and a full
    replay from a fresh checkpoint changes nothing."""
    root = tmp_path_factory.mktemp("mvstream")
    src_dir = str(root / "src")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(3).write.parquet(src_dir)

    mv = _view(root)

    def drain(ckpt: str) -> None:
        q = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .writeStream.foreachBatch(
                lambda df, epoch: mv.refresh(
                    spark, df, batch_id=f"e{epoch}"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(str(root / "ckpt1"))
    got = {tuple(r) for r in mv.read(spark).collect()}
    want = {tuple(r) for r in _full_recompute(orders).collect()}
    assert got == want
    assert len(mv.applied_batches()) >= 2  # multiple epochs folded

    drain(str(root / "ckpt2"))  # worst case: full replay, all no-ops
    assert {tuple(r) for r in mv.read(spark).collect()} == want
