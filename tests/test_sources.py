"""Custom Python DataSource tests (sources/synthetic.py): partition-
parallel synthesis, option handling, and cross-run determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.sources import register_synthetic_source


def _read(spark, **opts):
    register_synthetic_source(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_row_count_is_partitions_times_rows(spark):
    df = _read(spark, partitions=3, rowsPerPartition=500)
    assert df.count() == 1500
    assert df.select("event_id").distinct().count() == 1500


def test_schema_and_value_domains(spark):
    df = _read(spark, partitions=2, rowsPerPartition=200, users=10)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    row = df.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("value"), F.countDistinct("event_type"),
    ).first()
    assert 0 <= row[0] and row[1] < 10
    assert row[2] >= 0.0
    assert row[3] <= 4


def test_same_seed_same_data(spark):
    a = _read(spark, partitions=2, rowsPerPartition=300, seed=7)
    b = _read(spark, partitions=2, rowsPerPartition=300, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_different_seed_different_data(spark):
    a = _read(spark, partitions=1, rowsPerPartition=300, seed=7)
    b = _read(spark, partitions=1, rowsPerPartition=300, seed=8)
    assert a.exceptAll(b).count() > 0


def test_composes_with_engine_operators(spark):
    # the synthesized table is a first-class relation: aggregates,
    # windows, joins all plan over it like any scan
    df = _read(spark, partitions=4, rowsPerPartition=250)
    by_type = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert by_type.agg(F.sum("n")).first()[0] == 1000
