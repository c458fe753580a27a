"""Bucketed co-located join: result equals the plain join AND the plan
has no Exchange on either join side (the shuffle was paid at write)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import Tables
from etl_tpch_spark.pipeline.bucketed import cobucket_orders_lineitem

from .conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse dir is a static conf — managed tables land in the
    # session default; DROP TABLE (teardown) removes their files
    t = Tables(spark, TEST_SF_DIR)
    bo, bl = cobucket_orders_lineitem(
        spark, t.orders, t.lineitem, n_buckets=4, prefix="tb"
    )
    yield bo, bl
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")


def _join(o, l):
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


def test_bucketed_join_no_exchange(spark, bucketed):
    bo, bl = bucketed
    # test tables are tiny → disable auto-broadcast so the join takes
    # the fact⋈fact (sort-merge) path it would at real scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _join(bo, bl)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle at all
    assert "SelectedBucketsCount" in plan


def test_bucketed_join_matches_plain(spark, bucketed):
    bo, bl = bucketed
    t = Tables(spark, TEST_SF_DIR)
    got = _join(bo, bl)
    exp = _join(t.orders, t.lineitem)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
