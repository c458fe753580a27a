"""Convergence-variant graph ops (VERDICT r3 #4): the bounded forms
(graph_pagerank 3 rounds, graph_kcore 10 peels) keep both engines on an
identical computation for hash equality; the *_until_converged forms
are the production paths that stop when the fixpoint is actually
reached.  Pinned here: (a) the converged result equals the bounded form
run for the same number of rounds — same computation, self-stopping;
(b) a deliberately-low bound differs — the loop is doing real work;
(c) the k-core fixpoint is stable under one more peel."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    from etl_tpch_spark.catalog import load_table
    from etl_tpch_spark.similarity.ann import cosine_pairs_threshold_cells

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        cosine_pairs_threshold_cells(emb, 0.2)
        .select("vec_a", "vec_b")
        .localCheckpoint(eager=False)
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): convergence loop
def test_pagerank_converges_and_matches_bounded_form(edges):
    from etl_tpch_spark.operators.graph import (
        pagerank,
        pagerank_until_converged,
    )

    # 1e-4 of total mass keeps the round count (~12 on the fixture)
    # small enough to replay as ONE bounded uncheckpointed plan below
    ranks, rounds = pagerank_until_converged(edges, tol_scaled=10**8)
    assert rounds > 1  # the loop actually iterated
    # same computation as the bounded form run for exactly `rounds`
    assert _rows(ranks) == _rows(pagerank(edges, iterations=rounds))
    # a deliberately-low bound has NOT converged
    assert _rows(ranks) != _rows(pagerank(edges, iterations=1))


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): convergence loop
def test_pagerank_converged_delta_is_below_tolerance(edges):
    """The stopping condition means what it says: one more round past
    the stopping point moves less than tol_scaled total rank mass."""
    from etl_tpch_spark.operators.graph import (
        pagerank,
        pagerank_until_converged,
    )

    tol = 10**8  # 1e-4 of total mass (keeps the replayed plan small)
    ranks, rounds = pagerank_until_converged(edges, tol_scaled=tol)
    nxt = pagerank(edges, iterations=rounds + 1)
    delta = (
        ranks.select("node", F.col("pr_scaled").alias("a"))
        .join(nxt.select("node", F.col("pr_scaled").alias("b")), "node")
        .agg(F.sum(F.abs(F.col("a") - F.col("b"))).alias("d"))
        .collect()[0]["d"]
    )
    assert delta <= tol, delta


def test_kcore_converges_and_matches_bounded_query(spark, sf_dir, edges):
    from etl_tpch_spark.operators.graph import kcore_until_converged
    from etl_tpch_spark.queries.graph import _KCORE_K, graph_kcore

    got, rounds = kcore_until_converged(edges, _KCORE_K)
    # the registered bounded query peels the same 0.2-threshold graph
    # for 10 rounds, which reaches the fixpoint at fixture scale
    assert _rows(got) == _rows(graph_kcore(spark, sf_dir))
    assert rounds >= 2  # includes the no-change confirmation round


def test_kcore_low_bound_differs(spark, edges):
    """One peel round on the fixture graph has not converged — the
    until-converged loop is observable work, not a no-op wrapper."""
    from etl_tpch_spark.operators.graph import kcore_until_converged
    from etl_tpch_spark.queries.graph import _KCORE_K

    got, rounds = kcore_until_converged(edges, _KCORE_K)
    one_round, _ = kcore_until_converged(edges, _KCORE_K, max_rounds=1)
    assert rounds > 1
    assert _rows(one_round) != _rows(got)
