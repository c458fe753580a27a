"""Physical-plan regression tests (SURVEY.md §4 discipline).

Correctness tests can't catch a plan regression — a flagship that
silently loses its broadcast hint or its parquet filter pushdown still
returns the right rows, just 100× slower at scale.  These tests pin the
plan properties the engine's scale story depends on.
"""

from __future__ import annotations

import pytest

from etl_tpch_spark import registry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = registry.load_all()

    def get(name: str) -> str:
        df = qs[name].fn(spark, sf_dir)
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    return get


def test_flagship_plan(plans):
    p = plans("flagship_unshipped_orders")
    # dims broadcast, facts pre-filtered at the scan, true top-k operator
    assert p.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in p
    assert "LessThan(o_orderdate" in p  # date predicate reached parquet
    assert "GreaterThan(l_shipdate" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "SortMergeJoin" not in p


def test_flagship_column_pruning(plans):
    p = plans("flagship_unshipped_orders")
    # lineitem scan must read only the 4 needed columns
    for line in p.splitlines():
        if "ReadSchema" in line and "l_orderkey" in line:
            assert "l_quantity" not in line and "l_returnflag" not in line


def test_q1_partial_aggregation(plans):
    p = plans("q1_pricing_summary")
    # partial (map-side) + final HashAggregate pair around one exchange
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_topk_window_single_shuffle_per_stage(plans):
    p = plans("topk_per_segment_window")
    # window top-k: no TakeOrdered (global), but a single window sort
    assert "RunningWindowFunction" in p or "Window" in p
    assert "BroadcastHashJoin" in p  # customer dim broadcast


def test_q9_dims_broadcast(plans):
    p = plans("q9_product_type_profit")
    assert p.count("BroadcastHashJoin") >= 2
    assert "PushedFilters" in p


def test_ann_ivf_no_corpus_shuffle_for_assignment(plans):
    p = plans("sim_ann_topk_ivf")
    # centroid set must broadcast; corpus assignment is map-side
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_minhash_no_cartesian(plans):
    p = plans("dedup_minhash_lsh")
    assert "CartesianProduct" not in p  # band equi-join, never all-pairs


def test_span_window_exchanges_compact_docs_not_tokens(spark, sf_dir):
    """The span rolling-hash window must receive its doc_id
    distribution from an exchange of the COMPACT documents frame, not
    of the exploded token rows: Generate preserves its child's
    partitioning, so the plan must read Exchange → Generate (not
    Generate → Exchange), keeping SPAN_W-hashed token rows off the
    wire (round-7 rewrite, dedup/spans.py window_hashes)."""
    from etl_tpch_spark.catalog import load_table
    from etl_tpch_spark.dedup.spans import window_hashes

    df = window_hashes(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    gen = plan.index("Generate")
    # every Exchange in this linear plan sits below (after, in the
    # printed tree) the Generate — i.e. between scan and explode
    assert "Exchange" in plan
    assert plan.index("Exchange") > gen, plan[:800]


# Queries where a nested-loop/cartesian join is *by design*: one-row
# scalar broadcasts (q11/q22), the derived-partsupp non-equi build (q2),
# and the documented all-pairs baselines (brute cosine, and the tiny
# centroid/query broadcasts of IVF/bruteforce ANN).  dedup_simhash,
# dedup_embedding_clusters and sim_kmeans_clusters graduated OUT of
# this list in round 2 (banding / cell kernels / numpy Lloyd) —
# test_plan_audit.py asserts they stay clean.
NLJ_ALLOWED = {
    "q11_important_stock",
    "q22_sales_opportunity",
    "q2_min_cost_supplier",
    "sim_ann_topk_bruteforce",
    "sim_ann_topk_ivf",
    "sim_ann_topk_ivf_indexed",  # same |Q|×K centroid-ranking cross
    # join as sim_ann_topk_ivf (K=16 stored centroids, broadcast)
    "sim_cosine_pairs",
    "sim_quantized_cosine_pairs",  # documented all-pairs baseline
    "sample_temperature_mixture",  # 1-row n_min aggregate cross join
    "ts_gapfill_hourly",  # dense grid = hours × event_types, both tiny
    "ts_locf_hourly",  # same data-size-independent grid cross join
    "graph_pagerank",  # one-row node-count broadcast per round
    "agg_hll_distinct_customers",  # 1-row sketch × 1-row audit join
    "text_bm25_topk",  # 1-row corpus-stats (N, avgdl) broadcast
    "sim_ann_topk_matryoshka",  # |Q|x n coarse prefix pass, like bruteforce
    "sim_contrastive_negatives",  # broadcast-query corpus scan, like
    # bruteforce — swap in any candidate generator at scale (docstring)
    "sim_contrastive_negatives_indexed",  # |Q|×K stored-centroid
    # ranking + |Q|×64 fixed easy-pool scoring — both broadcast joins
    # of constant-size frames; the corpus itself joins on cell id
    "search_hybrid_rrf",  # dense candidates via the bruteforce scan
    # (exactness baseline; swaps for the IVF index at scale — the
    # fusion only consumes rank lists, docstring)
    "sim_mmr_diverse_topk",  # pool = broadcast-query corpus scan
    # (any ANN candidate generator slots in); greedy rounds touch
    # only the 50-row pool
    "text_bm25_topk_indexed",  # the same 1-row corpus-stats (N,
    # avgdl) broadcast as text_bm25_topk — shared kernel
    "text_bm25_topk_pruned",  # same shared bm25_topk kernel (1-row
    # stats crossjoin); the MaxScore restriction adds equi-joins only
    "search_hybrid_rrf_indexed",  # |Q|×K stored-centroid ranking
    # (the IVF probe, like sim_ann_topk_ivf_indexed) + the 1-row
    # BM25-stats broadcast; every corpus-sized join is an equi-join
    # on term or cell
}


def test_no_unexpected_nested_loop_joins(spark, sf_dir):
    """Every registered query's plan is free of CartesianProduct /
    BroadcastNestedLoopJoin unless explicitly allowlisted — catches an
    accidentally-dropped equi-join condition anywhere in the engine.

    Plans are built on a thread pool: planning happens JVM-side (py4j
    releases the GIL), queries only READ the shared session, and the
    few session mutations a q.fn performs (createOrReplaceTempView,
    cache-dict inserts) are idempotent for a fixed sf_dir — this was
    the suite's single slowest test (~66 s serial for 160+ plans)."""
    from concurrent.futures import ThreadPoolExecutor

    qs = registry.load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )

    def plan_marks(item):
        name, q = item
        plan = (
            q.fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        )
        return name, [
            m
            for m in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if m in plan
        ]

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(plan_marks, qs.items()))
    offenders = {
        name: marks
        for name, marks in results
        if marks and name not in NLJ_ALLOWED
    }
    assert not offenders, offenders


def test_no_inferred_filter_above_computed_explode(spark, sf_dir):
    """InferFiltersFromGenerate is excluded (session.py): for a
    COMPUTED array the inferred `size(e) > 0 AND isnotnull(e)` filter
    re-evaluates the whole expression twice more per row in an
    interpreted Filter — measured 6× on the classifier's md5-bucket
    explode (4.96 s → 0.81 s at sf0.1).  Generate skips null/empty
    inputs on its own, so nothing is lost.  Pin: the feature
    expression never appears in a Filter above the scan."""
    from pyspark.sql import functions as F

    from etl_tpch_spark.catalog import Tables
    from etl_tpch_spark.pipeline.quality_clf import doc_features

    feat = doc_features(Tables(spark, sf_dir).documents)
    ex = feat.select("doc_id", F.explode("buckets").alias("b"))
    plan = ex._jdf.queryExecution().executedPlan().toString()
    assert "size(array_union" not in plan
