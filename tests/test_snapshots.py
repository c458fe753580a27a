"""Snapshot/time-travel tests (pipeline/snapshots.py): a snapshot must
survive compaction AND upsert (both replace the table directory), cost
zero data copies, and read back the exact pre-rewrite state."""

from __future__ import annotations

import os

import pytest

from etl_tpch_spark.pipeline.snapshots import (
    drop_snapshot,
    list_snapshots,
    read_snapshot,
    take_snapshot,
)
from etl_tpch_spark.pipeline.upsert import upsert_table


@pytest.fixture()
def kv_table(spark, tmp_path):
    processed = str(tmp_path / "processed")
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, val string, version long"
    )
    upsert_table(spark, processed, "kv", df, key="k")
    return processed


def test_snapshot_survives_upsert_rewrite(spark, kv_table):
    path = os.path.join(kv_table, "kv")
    n_files = take_snapshot(path, "v1")
    assert n_files > 0
    assert list_snapshots(path) == ["v1"]

    # full copy-on-write rewrite: table dir is renamed away + deleted
    updates = spark.createDataFrame(
        [(1, "a2", 2), (3, "c", 1)], "k long, val string, version long"
    )
    upsert_table(spark, kv_table, "kv", updates, key="k")

    live = {(r.k, r.val) for r in spark.read.parquet(path).collect()}
    old = {
        (r.k, r.val)
        for r in read_snapshot(spark, path, "v1").collect()
    }
    assert live == {(1, "a2"), (2, "b"), (3, "c")}
    assert old == {(1, "a"), (2, "b")}  # history intact


def test_snapshot_survives_compaction(spark, kv_table):
    from etl_tpch_spark.pipeline.compact import compact_table

    path = os.path.join(kv_table, "kv")
    take_snapshot(path, "pre_compact")
    compact_table(spark, kv_table, "kv")
    assert {
        (r.k, r.val)
        for r in read_snapshot(spark, path, "pre_compact").collect()
    } == {(1, "a"), (2, "b")}


def test_snapshot_tags_immutable_and_droppable(spark, kv_table):
    path = os.path.join(kv_table, "kv")
    take_snapshot(path, "v1")
    with pytest.raises(ValueError, match="already exists"):
        take_snapshot(path, "v1")
    take_snapshot(path, "v2")
    assert list_snapshots(path) == ["v1", "v2"]
    drop_snapshot(path, "v1")
    assert list_snapshots(path) == ["v2"]
    # live table untouched by retention
    assert spark.read.parquet(path).count() == 2


def test_read_missing_snapshot_raises(spark, kv_table):
    path = os.path.join(kv_table, "kv")
    with pytest.raises(ValueError, match="no snapshot"):
        read_snapshot(spark, path, "nope")
