"""plans/audit.py unit tests: feature extraction and assertion
behavior on plans whose shape we know."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.plans import assert_plan, plan_features


def test_broadcast_join_detected(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer),
        orders.o_custkey == customer.c_custkey,
    )
    feats = plan_features(j)
    assert feats["broadcast_hash_join"] >= 1
    assert feats["cartesian_product"] == 0
    assert feats["parquet_scans"] == 2


def test_pushdown_detected(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey")
    feats = plan_features(li)
    assert feats["scans_with_pushed_filters"] == 1


def test_topk_operator_detected(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    topk = li.orderBy(F.col("l_extendedprice").desc()).limit(5)
    assert plan_features(topk)["take_ordered_and_project"] == 1


def test_assert_plan_raises_on_forbidden(spark, sf_dir):
    a = load_table(spark, sf_dir, "region")
    b = load_table(spark, sf_dir, "nation")
    cross = a.crossJoin(b)
    with pytest.raises(AssertionError, match="forbidden"):
        assert_plan(
            cross,
            forbid=("cartesian_product", "broadcast_nested_loop_join"),
        )


def test_assert_plan_requires_minimums(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").count()
    feats = assert_plan(agg, require={"hash_aggregate": 2, "exchange": 1})
    assert feats["hash_aggregate"] >= 2  # partial + final
    with pytest.raises(AssertionError, match="required"):
        assert_plan(agg, require={"sort_merge_join": 1})


def test_subquadratic_kernels_have_no_bnlj(spark, sf_dir):
    """Round-2 scale contract: the product paths that replaced all-pairs
    kernels must stay free of nested-loop joins — banded simhash,
    cell-scoped embedding pairs, the LSH-fed embedding clusters, the
    incremental dedup, and all three graph queries (whose BNLJ budget is
    exactly the 1-row n_nodes cross joins in pagerank, bounded at 4)."""
    from etl_tpch_spark import registry

    qs = registry.load_all()
    strictly_clean = (
        "dedup_simhash",
        "sim_cosine_pairs_cells",
        "sim_quantized_cosine_pairs_cells",
        "dedup_embedding_clusters",
        "dedup_incremental",
        "graph_degree_distribution",
        "graph_triangle_count",
    )
    for name in strictly_clean:
        feats = plan_features(qs[name].fn(spark, sf_dir))
        assert feats["broadcast_nested_loop_join"] == 0, name
        assert feats["cartesian_product"] == 0, name
    pr = plan_features(qs["graph_pagerank"].fn(spark, sf_dir))
    assert pr["broadcast_nested_loop_join"] <= 4  # 1-row n_nodes joins
    assert pr["cartesian_product"] == 0
