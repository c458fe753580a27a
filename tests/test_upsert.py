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


def test_partitioned_upsert_rewrites_only_affected(spark, tmp_path):
    """upsert_partitioned must merge per partition, leave other
    partitions' files byte-untouched, and report what it rewrote."""
    import os

    from etl_tpch_spark.pipeline.io import table_files
    from etl_tpch_spark.pipeline.upsert import upsert_partitioned

    processed = str(tmp_path / "processed")
    base = spark.createDataFrame(
        [(1, "a", 1, "d1"), (2, "b", 1, "d1"), (3, "c", 1, "d2")],
        "k long, val string, version long, day string",
    )
    upsert_partitioned(
        spark, processed, "kv", base,
        key="k", partition_col="day", order_col="version",
    )
    path = os.path.join(processed, "kv")
    d2_files_before = {
        f: os.path.getmtime(f)
        for f in table_files(path)
        if "day=d2" in f
    }

    updates = spark.createDataFrame(
        [(1, "a2", 2, "d1"), (9, "new", 1, "d3")],
        "k long, val string, version long, day string",
    )
    rewritten = upsert_partitioned(
        spark, processed, "kv", updates,
        key="k", partition_col="day", order_col="version",
    )
    assert rewritten == ["d1", "d3"]

    got = {
        (r.k): (r.val, r.version, r.day)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a2", 2, "d1"),
        2: ("b", 1, "d1"),
        3: ("c", 1, "d2"),
        9: ("new", 1, "d3"),
    }
    # untouched partition: same files, same mtimes
    d2_files_after = {
        f: os.path.getmtime(f)
        for f in table_files(path)
        if "day=d2" in f
    }
    assert d2_files_after == d2_files_before
    # no leftover temp/old dirs
    assert not [
        d for d in os.listdir(path) if d.startswith((".upsert", ".old"))
    ]


def test_partitioned_upsert_replay_cannot_regress(spark, tmp_path):
    from etl_tpch_spark.pipeline.upsert import upsert_partitioned

    processed = str(tmp_path / "processed")
    new = spark.createDataFrame(
        [(1, "new", 5, "d1")], "k long, val string, version long, day string"
    )
    old = spark.createDataFrame(
        [(1, "old", 2, "d1")], "k long, val string, version long, day string"
    )
    upsert_partitioned(
        spark, processed, "kv", new,
        key="k", partition_col="day", order_col="version",
    )
    upsert_partitioned(
        spark, processed, "kv", old,
        key="k", partition_col="day", order_col="version",
    )
    import os
    rows = spark.read.parquet(os.path.join(processed, "kv")).collect()
    assert [(r.k, r.val, r.version) for r in rows] == [(1, "new", 5)]
