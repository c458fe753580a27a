"""Probabilistic-structure operators (queries/sketches.py,
operators/bloom.py): HLL merge associativity (daily sketches roll up
to the one-shot sketch bit-exactly), bloom no-false-negatives, and
bloom-semi-join ≡ plain semi-join.  The cross-engine value checks ride
the oracle-diff sweep (tests/test_oracle_diff.py) like every registry
entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tpch_spark.catalog import Tables
from etl_tpch_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)
from etl_tpch_spark.queries.sketches import (
    _M_DAILY,
    _RANK_MAX_DAILY,
    _hll_spark,
)


def _daily_registers(spark, sf_dir):
    t = Tables(spark, sf_dir)
    rows = t.events.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("user_id").cast("string").alias("k"),
    )
    return _hll_spark(rows, F.col("k"), _M_DAILY, _RANK_MAX_DAILY)


def test_hll_sketch_merge_is_exact(spark, sf_dir):
    """The property that makes HLL the 100 TB distinct counter: the
    register max is associative, so per-day sketches merged by
    ``max`` equal the sketch built in one pass over all events —
    bit-for-bit, not approximately."""
    scored = _daily_registers(spark, sf_dir)
    one_shot = (
        scored.groupBy("reg")
        .agg(F.max("rho").alias("m_rho"))
        .orderBy("reg")
        .collect()
    )
    merged = (
        scored.groupBy("day", "reg")
        .agg(F.max("rho").alias("m_rho"))  # daily sketches...
        .groupBy("reg")
        .agg(F.max("m_rho").alias("m_rho"))  # ...merged
        .orderBy("reg")
        .collect()
    )
    assert [tuple(r) for r in one_shot] == [tuple(r) for r in merged]


def test_hll_estimate_within_tolerance(spark, sf_dir):
    from etl_tpch_spark.queries.sketches import (
        agg_hll_distinct_customers,
    )

    row = agg_hll_distinct_customers(spark, sf_dir).first()
    assert row["true_distinct"] > 0
    # m=256 ⇒ σ ≈ 6.5%; 4σ is a generous deterministic bound for the
    # fixed test data (the value itself is pinned by the oracle diff)
    assert row["err_pct"] < 26.0


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every inserted key must pass the membership test — bloom's
    one-sided error guarantee, over all customer keys."""
    t = Tables(spark, sf_dir)
    keys = t.customer.select("c_custkey").distinct()
    words = bloom_build(keys, "c_custkey")
    missed = keys.where(
        ~bloom_might_contain("c_custkey", words)
    ).count()
    assert missed == 0


def test_bloom_semi_join_equals_plain(spark, sf_dir):
    t = Tables(spark, sf_dir)
    rich = t.customer.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    got = bloom_semi_join(t.orders, rich, "o_custkey", "c_custkey")
    plain = t.orders.join(
        rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in plain.collect()
    )


def test_bloom_prefilter_actually_prunes(spark, sf_dir):
    """The bloom filter must reject most non-matching probe rows
    before the join — otherwise it's overhead, not pruning.  With
    ~7% of customers passing the balance cut and ~1% false-positive
    sizing, the filtered probe side should be well under half the
    fact table."""
    t = Tables(spark, sf_dir)
    rich = t.customer.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    words = bloom_build(rich.distinct(), "c_custkey")
    total = t.orders.count()
    passed = t.orders.where(
        bloom_might_contain("o_custkey", words)
    ).count()
    matched = t.orders.join(
        rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).count()
    assert matched <= passed < total * 0.5


def test_bloom_filter_evaluates_before_join(spark, sf_dir):
    """Plan shape: the membership expression sits in a Filter on the
    probe side BELOW the semi-join — early pruning, not post-join."""
    t = Tables(spark, sf_dir)
    rich = t.customer.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    plan = (
        bloom_semi_join(t.orders, rich, "o_custkey", "c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_at = plan.find("LeftSemi")
    filt_at = plan.find("element_at")
    assert join_at != -1 and filt_at != -1
    # in the tree printout, children (the probe scan+filter) appear
    # AFTER their parent join node
    assert filt_at > join_at


def test_unbounded_bloom_equals_plain_semi_join(spark, sf_dir):
    """bloom_semi_join_unbounded ≡ the plain left-semi join on real
    tables (false positives killed by the exact join that follows)."""
    from etl_tpch_spark.catalog import load_table
    from etl_tpch_spark.operators.bloom import bloom_semi_join_unbounded

    orders = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    )
    got = bloom_semi_join_unbounded(
        orders, rich, "o_custkey", "c_custkey"
    )
    want = orders.join(
        rich.select("c_custkey").distinct(),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): 100k-key sweep
def test_unbounded_bloom_prune_rate_at_100k_keys(spark):
    """The VERDICT r3 #2 gate: at a 100k-key build side — ~15× past
    the literal form's 65,536-bit ceiling — the word-table bloom must
    still prune ≥90% of non-matching probe rows, while the capped
    literal form has decayed to near-zero pruning (FP → 1).  Also pins
    zero false negatives (every true match survives the prefilter)."""
    from etl_tpch_spark.operators.bloom import (
        auto_m_bits_unbounded,
        bloom_might_contain,
        bloom_build,
        bloom_prefilter_wordtable,
        bloom_words,
    )

    n_build, n_probe = 100_000, 200_000
    build = spark.range(n_build).select(
        (F.col("id") * 7919).alias("k")  # sparse keys: misses exist
    )
    # probe: half true matches, half guaranteed misses (odd offsets)
    probe = spark.range(n_probe).select(
        F.when(F.col("id") < n_probe // 2, F.col("id") * 7919)
        .otherwise(F.col("id") * 7919 + 1)
        .alias("k")
    )
    m = auto_m_bits_unbounded(n_build)
    assert m >= 10 * n_build  # the uncapped promise
    words = bloom_words(build, "k", m_bits=m)
    kept = bloom_prefilter_wordtable(
        probe, "k", words, m_bits=m
    ).count()
    matches = n_probe // 2
    false_kept = kept - matches
    assert kept >= matches  # no false negatives
    prune_rate = 1 - false_kept / (n_probe - matches)
    assert prune_rate >= 0.90, prune_rate
    # the capped literal form at the same build size: FP ≈ 1 — the
    # decay that motivates the word-table path (documented, not fixed)
    capped_words = bloom_build(build, "k", m_bits=65536)
    capped_kept = probe.where(
        bloom_might_contain("k", capped_words)
    ).count()
    capped_prune = 1 - (capped_kept - matches) / (n_probe - matches)
    assert capped_prune <= 0.10, capped_prune
