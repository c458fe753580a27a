"""Salted join / aggregation must be result-identical to the plain
forms on skewed data (the salt is an internal physical detail)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    skew_profile,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows for key 1 (hot), a few for keys 2..5
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(40).select(
        (F.col("id") % 4 + 2).cast("int").alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (6, "unmatched")],
        "k int, name string",
    )


def test_salted_join_equals_plain(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, "k", n_salts=4).groupBy(
        "k", "name"
    ).count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_preserves_unmatched(skewed, dim):
    out = salted_join(skewed, dim, "k", n_salts=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == (
        skewed.filter(F.col("k").isin(4, 5)).count()
    )


def test_salted_aggregate_equals_plain(skewed):
    plain = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r.k: (r.total, r.n, r.lo, r.hi)
        for r in salted_aggregate(
            skewed,
            ["k"],
            {
                "total": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted


def test_skew_profile_flags_hot_key(skewed):
    prof = skew_profile(skewed, "k", top=2).collect()
    assert prof[0].k == 1 and prof[0].share > 0.9
