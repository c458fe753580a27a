"""Catalog-statistics tests (pipeline/stats.py): ANALYZE TABLE must
land rowCount/sizeInBytes where the optimizer reads them, and the
one-scan column profile must match per-column recomputation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table, table_path
from etl_tpch_spark.pipeline.stats import (
    analyze_table,
    column_profile,
    table_stats,
)


@pytest.fixture()
def orders_table(spark, sf_dir):
    name = "stats_test_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} USING parquet "
        f"LOCATION '{table_path(sf_dir, 'orders')}'"
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_analyze_populates_catalog_stats(spark, sf_dir, orders_table):
    analyze_table(spark, orders_table, columns=["o_orderkey", "o_custkey"])
    stats = table_stats(spark, orders_table)
    n = load_table(spark, sf_dir, "orders").count()
    assert int(stats["rowCount"]) == n
    assert int(stats["sizeInBytes"]) > 0


def test_column_profile_matches_direct_aggregates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prof = {
        r["column"]: r
        for r in column_profile(
            orders, ["o_custkey", "o_totalprice"]
        ).collect()
    }
    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("ndv_ck"),
        F.min("o_totalprice").alias("min_tp"),
        F.max("o_totalprice").alias("max_tp"),
    ).first()
    assert prof["o_custkey"].n_rows == direct["n"]
    assert prof["o_custkey"].ndv == direct["ndv_ck"]
    assert prof["o_totalprice"].min_value == direct["min_tp"]
    assert prof["o_totalprice"].max_value == direct["max_tp"]


def test_column_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    )
    row = column_profile(df, ["v"]).first()
    assert row.n_rows == 3
    assert row.n_not_null == 2
    assert row.ndv == 2
