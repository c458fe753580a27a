"""Persisted bigram-LM index (pipeline/lm_index.py): batched ingests
derive the same conditionals as one-shot training, indexed scoring
equals the query bit-for-bit, replayed ingests are no-ops, fold()
compacts without changing one conditional, and the scoring tick's plan
never retokenizes the reference corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.functions.lm import bigram_counts, lm_from_counts
from etl_tpch_spark.pipeline.lm_index import LmIndex
from etl_tpch_spark.plans import plan_features
from etl_tpch_spark.queries.text import (
    _LM_REF_SOURCE,
    text_lm_quality_filter,
)


def _ref_halves(spark, sf_dir):
    ref = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == _LM_REF_SOURCE
    )
    return (
        ref.filter(F.col("doc_id") % 2 == 0),
        ref.filter(F.col("doc_id") % 2 == 1),
    )


def _build(spark, sf_dir, path) -> LmIndex:
    a, b = _ref_halves(spark, sf_dir)
    idx = LmIndex(str(path))
    idx.ingest(a, batch_id="ref-0")
    idx.ingest(b, batch_id="ref-1")
    return idx


def test_batched_ingests_equal_one_shot_lm(spark, sf_dir, tmp_path):
    """Two ingests over disjoint halves of the reference slice derive
    the SAME conditional table as counting it in one pass — count
    summation is associative, so this is equality, not tolerance."""
    idx = _build(spark, sf_dir, tmp_path / "lm")
    got = {
        (r.w1, r.w2): r.p_micro for r in idx.lm(spark).collect()
    }
    ref = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == _LM_REF_SOURCE
    )
    want = {
        (r.w1, r.w2): r.p_micro
        for r in lm_from_counts(bigram_counts(ref)).collect()
    }
    assert got == want


def test_indexed_scoring_equals_query(spark, sf_dir, tmp_path):
    """score() against the stored LM reproduces the registered query's
    numbers exactly (shared helpers ⇒ equality by construction)."""
    idx = _build(spark, sf_dir, tmp_path / "lm")
    docs = load_table(spark, sf_dir, "documents")
    got = [tuple(r) for r in idx.score(spark, docs).collect()]
    want = [
        tuple(r)
        for r in text_lm_quality_filter(spark, sf_dir)
        .drop("keep")
        .collect()
    ]
    assert got == want


def test_ingest_replay_is_noop(spark, sf_dir, tmp_path):
    a, _ = _ref_halves(spark, sf_dir)
    idx = LmIndex(str(tmp_path / "lm"))
    v1 = idx.ingest(a, batch_id="ref-0")
    v2 = idx.ingest(a, batch_id="ref-0")  # replayed crawl batch
    assert v1 == v2 == 1
    assert idx.table.latest_version() == 1


def test_fold_compacts_without_changing_conditionals(
    spark, sf_dir, tmp_path
):
    idx = _build(spark, sf_dir, tmp_path / "lm")
    before = {
        (r.w1, r.w2): r.p_micro for r in idx.lm(spark).collect()
    }
    rows_before = idx.table.read(spark).count()
    assert idx.fold(spark) is not None
    after = {
        (r.w1, r.w2): r.p_micro for r in idx.lm(spark).collect()
    }
    assert after == before
    assert idx.table.read(spark).count() <= rows_before
    # folded: exactly one row per bigram
    folded = idx.table.read(spark)
    assert (
        folded.groupBy("w1", "w2").count().filter("count > 1").count()
        == 0
    )


def test_scoring_tick_reads_index_not_reference_text(
    spark, sf_dir, tmp_path
):
    """The O(new) contract: scoring a new crawl batch tokenizes the
    NEW docs only — the reference corpus contributes ONE columnar scan
    of the stored count table (per-w1 totals ride a window over the
    same scan since the lm_from_counts self-join was retired), never a
    second documents scan for LM retraining."""
    idx = _build(spark, sf_dir, tmp_path / "lm")
    new_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
    )
    scored = idx.score(spark, new_docs)
    feats = plan_features(scored)
    # 1 documents scan (the new batch) + 1 stored-count scan — nothing
    # else
    assert feats["parquet_scans"] == 2, feats
    plan = scored._jdf.queryExecution().executedPlan().toString()
    doc_scans = [
        ln
        for ln in plan.splitlines()
        if "documents.parquet" in ln and "Scan" in ln
    ]
    assert len(doc_scans) == 1, doc_scans
    assert str(tmp_path / "lm") in plan
    assert scored.count() > 0
