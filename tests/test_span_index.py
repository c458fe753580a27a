"""Persisted span-dedup window index (dedup/spans.py SpanIndex): the
daily-crawl tick must be O(new batch) — window only the new docs,
reuse stored hashes for the corpus — while producing exactly the batch
operator's spans for the new docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.dedup.spans import SpanIndex
from etl_tpch_spark.queries.text import text_duplicate_spans


def _spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens, r.n_windows)
        for r in df.collect()
    }


def test_indexed_tick_equals_batch_operator_on_new_docs(
    spark, sf_dir, tmp_path
):
    """Islands are per-doc, so restricting the doc set commutes with
    the merge: the tick's spans must equal the full batch operator's
    output filtered to the new half."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = SpanIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    got = _spans(idx.tick(spark, new, batch_id="day1"))
    want = {
        s
        for s in _spans(text_duplicate_spans(spark, sf_dir))
        if s[0] % 2 == 1
    }
    assert got == want
    assert got  # non-vacuous: fixture plants cross-parity dup spans


def test_two_tick_union_covers_batch(spark, sf_dir, tmp_path):
    """Splitting the new half into two crawl days changes nothing for
    docs whose duplicates were already stored: day-2 docs still see
    day-1 docs through the index."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    day1 = docs.filter(F.col("doc_id") % 4 == 1)
    day2 = docs.filter(F.col("doc_id") % 4 == 3)

    idx = SpanIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    idx.ingest(day1, batch_id="day1")
    idx.ingest(day2, batch_id="day2")
    # after all ingests, day-2 spans match the batch operator exactly
    got = _spans(idx.spans_touching(spark, day2.select("doc_id")))
    want = {
        s
        for s in _spans(text_duplicate_spans(spark, sf_dir))
        if s[0] % 4 == 3
    }
    assert got == want


def test_tick_plan_scans_index_not_corpus_text(spark, sf_dir, tmp_path):
    """THE scale contract: after ingest, the span query's plan reads
    the stored index parquet — no tokenization or hashing of corpus
    text.  The only documents scan left is the new batch's doc_id
    projection (column-pruned: no text column read)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = SpanIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    idx.ingest(new, batch_id="day1")

    spans = idx.spans_touching(spark, new.select("doc_id"))
    plan = spans._jdf.queryExecution().executedPlan().toString()

    assert str(tmp_path / "idx") in plan
    # zero re-windowing: gram construction / hashing never appears
    assert "md5" not in plan
    assert "posexplode" not in plan
    for ln in plan.splitlines():
        if "documents" in ln and "FileScan" in ln:
            assert "text" not in ln, ln


def test_replayed_batch_ingests_nothing(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)

    idx = SpanIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    n = idx.windows(spark).count()
    idx.ingest(corpus, batch_id="day0")  # replay
    assert idx.windows(spark).count() == n


def test_compact_preserves_windows(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = SpanIndex(str(tmp_path / "idx"))
    idx.ingest(docs.filter(F.col("doc_id") % 2 == 0), batch_id="day0")
    idx.ingest(docs.filter(F.col("doc_id") % 2 == 1), batch_id="day1")
    before = idx.windows(spark).count()
    idx.compact(spark, target_files=2)
    assert idx.windows(spark).count() == before
