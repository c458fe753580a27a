"""Streaming CDC-upsert sink tests (streaming/sink.py): a stream of
keyed, versioned updates merged into a parquet table must converge to
latest-version-per-key, stay idempotent under re-runs, and never
regress a key when an old batch replays."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from etl_tpch_spark.pipeline.upsert import latest_per_key, upsert_table
from etl_tpch_spark.streaming.sink import stream_upsert_sink

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)


def _write_updates(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, staging, processed, ckpt):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.json")
        .json(staging)
    )
    stream_upsert_sink(
        src, processed, "kv", ckpt, key="k", order_col="version"
    )


def _state(spark, processed):
    path = os.path.join(processed, "kv")
    return {
        (r.k): (r.val, r.version)
        for r in spark.read.parquet(path).collect()
    }


def test_stream_upsert_converges_and_is_idempotent(spark, tmp_path):
    staging = str(tmp_path / "staging")
    processed = str(tmp_path / "processed")
    ckpt = str(tmp_path / "ckpt")

    _write_updates(
        staging,
        "b1.json",
        [
            {"k": 1, "val": "a", "version": 1},
            {"k": 2, "val": "b", "version": 1},
            {"k": 2, "val": "b2", "version": 2},  # within-batch dup key
        ],
    )
    _run_stream(spark, staging, processed, ckpt)
    assert _state(spark, processed) == {1: ("a", 1), 2: ("b2", 2)}

    # second batch: update k=1, insert k=3
    _write_updates(
        staging,
        "b2.json",
        [
            {"k": 1, "val": "a9", "version": 9},
            {"k": 3, "val": "c", "version": 1},
        ],
    )
    _run_stream(spark, staging, processed, ckpt)
    assert _state(spark, processed) == {
        1: ("a9", 9),
        2: ("b2", 2),
        3: ("c", 1),
    }

    # re-run with same checkpoint and no new files: no state change
    _run_stream(spark, staging, processed, ckpt)
    assert _state(spark, processed) == {
        1: ("a9", 9),
        2: ("b2", 2),
        3: ("c", 1),
    }


def test_versioned_upsert_replay_cannot_regress(spark, tmp_path):
    processed = str(tmp_path / "processed")
    new = spark.createDataFrame([(1, "new", 5)], SCHEMA)
    old = spark.createDataFrame([(1, "old", 2)], SCHEMA)
    upsert_table(spark, processed, "kv", new, key="k", order_col="version")
    # replaying an OLDER update after a newer one landed is a no-op
    upsert_table(spark, processed, "kv", old, key="k", order_col="version")
    assert _state(spark, processed) == {1: ("new", 5)}


def test_unversioned_upsert_still_replaces(spark, tmp_path):
    processed = str(tmp_path / "processed")
    a = spark.createDataFrame([(1, "a", 1)], SCHEMA)
    b = spark.createDataFrame([(1, "b", 1)], SCHEMA)
    upsert_table(spark, processed, "kv", a, key="k")
    upsert_table(spark, processed, "kv", b, key="k")
    assert _state(spark, processed) == {1: ("b", 1)}


def test_latest_per_key_helper(spark):
    df = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 3), (1, "z", 2), (2, "w", 1)], SCHEMA
    )
    got = {(r.k): (r.val, r.version) for r in latest_per_key(df, "k", "version").collect()}
    assert got == {1: ("y", 3), 2: ("w", 1)}


def test_stream_merge_txtable_exactly_once(spark, sf_dir, tmp_path):
    """CDC batches drained into a TxTable merge sink: latest-wins per
    key, epoch batch ids make a full checkpoint-wiped replay a no-op,
    and the pre-merge versions stay readable."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_tpch_spark.pipeline.txlog import TxTable
    from etl_tpch_spark.streaming.sink import stream_merge_txtable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("ver", T.LongType()),
        ]
    )
    stage = str(tmp_path / "cdc")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [(1, "a", 1), (2, "b", 1), (1, "a2", 2)]  # 1 → a2 wins
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).json(os.path.join(stage, "b1.json"))

    def drain():
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.json")
            .option("recursiveFileLookup", "true")
            .json(stage)
        )
        stream_merge_txtable(
            src, table, ckpt, key="k", order_col="ver"
        )

    drain()
    t = TxTable(table)
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert got == {1: "a2", 2: "b"}
    v1 = t.latest_version()

    rows2 = [(2, "b9", 9), (3, "c", 1)]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "overwrite"
    ).json(os.path.join(stage, "b2.json"))
    drain()
    got = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert got == {1: "a2", 2: "b9", 3: "c"}
    # time travel to the pre-second-batch table
    pre = {r["k"]: r["val"] for r in t.read(spark, version=v1).collect()}
    assert pre == {1: "a2", 2: "b"}

    # full logical replay: wipe the checkpoint, re-drain everything —
    # epoch batch ids make every merge a no-op
    v = t.latest_version()
    shutil.rmtree(ckpt)
    drain()
    assert t.latest_version() == v
    assert {r["k"]: r["val"] for r in t.read(spark).collect()} == got
