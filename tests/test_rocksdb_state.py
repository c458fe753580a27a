"""Stateful streaming on the RocksDB state store (session.py
ROCKSDB_STATE_CONF): the provider Spark ships for state that outgrows
executor heap.  Same results as the default heap provider — pinned by
running two stateful shapes (dedup-within-watermark, stream-stream
join) under RocksDB and comparing against batch semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_tpch_spark.session import ROCKSDB_STATE_CONF

# slow tier: the RocksDB-provider variants of stateful shapes whose
# default-provider twins stay in the default gate (test_streaming)
pytestmark = pytest.mark.slow


@pytest.fixture()
def rocksdb(spark):
    """Set the RocksDB provider for queries started inside the test,
    restoring the session default afterwards (the provider binds at
    query start, so runtime conf is enough)."""
    old = {}
    for k, v in ROCKSDB_STATE_CONF.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_dedup_stream_on_rocksdb(rocksdb, spark, tmp_path):
    """dropDuplicatesWithinWatermark backed by RocksDB state: 2× input
    rows, 1× output — and the checkpoint state dir must actually hold
    RocksDB artifacts (.zip snapshots/changelogs, not heap .delta)."""
    from etl_tpch_spark.streaming.ingest import dedup_stream

    src_dir, out_dir, ck = (
        str(tmp_path / d) for d in ("in", "out", "ck")
    )
    base = spark.range(200).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
    )
    base.write.parquet(src_dir)
    base.write.mode("append").parquet(src_dir)  # every event twice

    src = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(src_dir)
    )
    q = (
        dedup_stream(src, watermark="365 days")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200

    # proof the RocksDB provider ran: its checkpoint layout
    state_files = []
    for root, _dirs, files in os.walk(os.path.join(ck, "state")):
        state_files += files
    assert any(f.endswith((".zip", ".changelog")) for f in state_files), (
        state_files[:10]
    )


def test_stream_stream_join_on_rocksdb(rocksdb, spark, tmp_path):
    """The buffered-both-sides shape (stream-stream join) — the state
    that actually outgrows heap first at scale — runs on RocksDB and
    equals the batch join."""
    from etl_tpch_spark.streaming import stream_orders_lineitem_join

    o = spark.range(50).select(
        F.concat(F.lit("o"), F.col("id")).alias("o_orderkey"),
        F.lit("c").alias("o_custkey"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=F.col("id").cast("int"))
        ).alias("o_order_time"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    l = o.select(
        F.col("o_orderkey").alias("l_orderkey"),
        (F.lit(100.0) + F.col("o_order_time").cast("long") % 7).alias(
            "l_extendedprice"
        ),
        F.lit(0.1).alias("l_discount"),
        (F.col("o_order_time") + F.expr("INTERVAL 1 DAY")).alias(
            "l_ship_time"
        ),
    )
    o_dir, l_dir = str(tmp_path / "o"), str(tmp_path / "l")
    o.write.json(o_dir)
    l.write.json(l_dir)

    def src(d, schema):
        return spark.readStream.schema(schema).json(d)

    joined = stream_orders_lineitem_join(
        src(o_dir, o.schema), src(l_dir, l.schema)
    )
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck2")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    exp = stream_orders_lineitem_join(
        spark.read.json(o_dir).withColumn(
            "o_order_time", F.col("o_order_time").cast("timestamp")
        ),
        spark.read.json(l_dir).withColumn(
            "l_ship_time", F.col("l_ship_time").cast("timestamp")
        ),
    )
    assert got.count() == exp.count() == 50
