"""Hybrid RRF retrieval (queries/search.py): fusion arithmetic and
list-shape properties on top of the registry oracle's full hash check
(tests/test_oracle_diff.py covers exact equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.queries.search import (
    N_DENSE,
    N_SPARSE,
    RRF_K,
    RRF_SCALE,
    TOP,
    search_hybrid_rrf,
)
from etl_tpch_spark.queries.similarity import QUERY_IDS


def test_rrf_shape_and_arithmetic(spark, sf_dir):
    rows = search_hybrid_rrf(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(QUERY_IDS)
    for qid, lst in by_q.items():
        assert len(lst) == TOP
        assert [r["rnk"] for r in lst] == list(range(1, TOP + 1))
        # rrf strictly consistent with rank order (ties broken doc_id)
        scores = [r["rrf_micro"] for r in lst]
        assert scores == sorted(scores, reverse=True)
        for r in lst:
            want = 0
            if r["sparse_rank"] is not None:
                assert 1 <= r["sparse_rank"] <= N_SPARSE
                want += RRF_SCALE // (RRF_K + r["sparse_rank"])
            if r["dense_rank"] is not None:
                assert 1 <= r["dense_rank"] <= N_DENSE
                want += RRF_SCALE // (RRF_K + r["dense_rank"])
            assert r["rrf_micro"] == want
            assert r["doc_id"] != qid  # self excluded on both channels


def test_rrf_rewards_dual_channel_hits(spark, sf_dir):
    """A doc present in BOTH candidate lists must outrank any doc whose
    single-channel rank is no better than its worse channel rank —
    the fusion property RRF exists for."""
    rows = search_hybrid_rrf(spark, sf_dir).collect()
    dual = [
        r
        for r in rows
        if r["sparse_rank"] is not None and r["dense_rank"] is not None
    ]
    singles = [
        r
        for r in rows
        if (r["sparse_rank"] is None) != (r["dense_rank"] is None)
    ]
    assert rows  # non-degenerate
    for d in dual:
        worst = max(d["sparse_rank"], d["dense_rank"])
        for s in singles:
            if s["query_id"] != d["query_id"]:
                continue
            srank = (
                s["sparse_rank"]
                if s["sparse_rank"] is not None
                else s["dense_rank"]
            )
            if srank >= worst:
                assert d["rrf_micro"] > s["rrf_micro"]


def test_indexed_hybrid_never_reads_corpus_text(spark, sf_dir):
    """The fully index-served hybrid's plan: lexical channel from the
    postings TxTable (zero documents.parquet scans — no tokenization
    at query time), dense channel from the IVF index's stored cells;
    embeddings.parquet appears only as the 5-row query-vector fetch."""
    from etl_tpch_spark.queries.search import search_hybrid_rrf_indexed

    res = search_hybrid_rrf_indexed(spark, sf_dir)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    assert "search-idx" in plan  # postings probe
    assert "ivf-idx" in plan  # stored cells scan
    assert res.count() > 0
