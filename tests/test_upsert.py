"""Copy-on-write keyed upsert: insert + replace semantics, atomic swap,
streaming-sink refusal."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.upsert import upsert_table


@pytest.fixture()
def proc(spark, tmp_path):
    d = str(tmp_path / "processed")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )
    base.write.parquet(os.path.join(d, "t"))
    return d


def test_upsert_replaces_and_inserts(spark, proc):
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, name string, val double"
    )
    n = upsert_table(spark, proc, "t", updates, key="id")
    assert n == 4
    got = {
        r.id: (r.name, r.val)
        for r in spark.read.parquet(os.path.join(proc, "t")).collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("B", 99.0),  # replaced
        3: ("c", 30.0),
        4: ("d", 40.0),  # inserted
    }


def test_upsert_creates_missing_table(spark, proc):
    updates = spark.createDataFrame([(7, "x", 1.0)], "id long, name string, val double")
    assert upsert_table(spark, proc, "fresh", updates, key="id") == 1
    assert spark.read.parquet(os.path.join(proc, "fresh")).count() == 1


def test_upsert_idempotent(spark, proc):
    updates = spark.createDataFrame(
        [(2, "B", 99.0)], "id long, name string, val double"
    )
    upsert_table(spark, proc, "t", updates, key="id")
    n = upsert_table(spark, proc, "t", updates, key="id")
    assert n == 3  # re-applying the same update changes nothing
    df = spark.read.parquet(os.path.join(proc, "t"))
    assert df.filter(F.col("id") == 2).first().val == 99.0


def test_upsert_refuses_streaming_dir(spark, proc):
    os.makedirs(os.path.join(proc, "t", "_spark_metadata"), exist_ok=True)
    updates = spark.createDataFrame([(1, "z", 0.0)], "id long, name string, val double")
    with pytest.raises(ValueError, match="streaming sink"):
        upsert_table(spark, proc, "t", updates, key="id")
