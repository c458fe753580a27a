"""Partitioned lakehouse layout: hive-partitioned ingest must produce
``col=value/`` directories and partition-filter pruning at planning
time (the 100 TB scan-avoidance path)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline import incrementalize, ingest_table

from .conftest import TEST_SF_DIR

NOW = datetime(2026, 3, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def partitioned(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("part")
    staging, processed = str(root / "staging"), str(root / "processed")
    incrementalize(spark, TEST_SF_DIR, staging, now=NOW, key_fn="hash")
    ingest_table(
        spark,
        staging,
        processed,
        "lineitem",
        partition_by=("ship_date",),
        derive={"ship_date": "date(l_ship_time)"},
    )
    return os.path.join(processed, "lineitem")


def test_hive_layout(partitioned):
    dirs = [d for d in os.listdir(partitioned) if d.startswith("ship_date=")]
    # ship times span [NOW, NOW+3d] → up to 4 daily partitions
    assert 2 <= len(dirs) <= 4


def test_rows_roundtrip(spark, partitioned):
    n_src = spark.read.parquet(
        os.path.join(TEST_SF_DIR, "lineitem.parquet")
    ).count()
    df = spark.read.parquet(partitioned)
    assert df.count() == n_src
    assert "ship_date" in df.columns  # partition col recovered


def test_partition_pruning_in_plan(spark, partitioned):
    df = spark.read.parquet(partitioned).filter(
        F.col("ship_date") == "2026-03-02"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    assert "ship_date" in plan.split("PartitionFilters", 1)[1][:200]
    # pruned read touches only the matching partition's rows
    pruned = df.count()
    exact = (
        spark.read.parquet(partitioned)
        .filter(F.to_date(F.col("l_ship_time")) == "2026-03-02")
        .count()
    )
    assert pruned == exact > 0


def test_compact_preserves_partition_layout(spark, partitioned):
    """Compaction must keep the hive layout (and thus pruning) intact."""
    from etl_tpch_spark.pipeline import compact_all

    parent = os.path.dirname(partitioned)
    pre_rows = spark.read.parquet(partitioned).count()
    pre_dirs = sorted(
        d for d in os.listdir(partitioned) if d.startswith("ship_date=")
    )
    compact_all(spark, parent, tables=("lineitem",))
    post_dirs = sorted(
        d for d in os.listdir(partitioned) if d.startswith("ship_date=")
    )
    assert post_dirs == pre_dirs
    df = spark.read.parquet(partitioned)
    assert df.count() == pre_rows
    plan = df.filter(F.col("ship_date") == "2026-03-02")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "PartitionFilters" in plan
