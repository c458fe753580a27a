"""Structural invariants of span-level exact substring dedup
(queries/text.py text_duplicate_spans / text_span_dedup_stats).

The oracle-diff suite proves cross-engine equality; these tests pin the
semantics the SQL alone doesn't make obvious: spans are maximal
(disjoint AND non-abutting), their geometry is internally consistent,
and the stats roll up exactly from the span table.
"""

from __future__ import annotations

from collections import defaultdict

from etl_tpch_spark.queries.text import (
    _SPAN_W,
    text_duplicate_spans,
    text_span_dedup_stats,
)


def test_spans_are_maximal_and_consistent(spark, sf_dir):
    rows = text_duplicate_spans(spark, sf_dir).collect()
    assert rows, "fixture plants near-dup docs; span table must be non-empty"
    by_doc = defaultdict(list)
    for r in rows:
        # geometry: inclusive interval, length identity, window budget
        assert r.span_end >= r.span_start
        assert r.n_tokens == r.span_end - r.span_start + 1
        assert r.n_tokens >= _SPAN_W
        # a span of L tokens holds at most L - W + 1 windows, at least 1
        assert 1 <= r.n_windows <= r.n_tokens - _SPAN_W + 1
        by_doc[r.doc_id].append((r.span_start, r.span_end))
    for doc_id, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            # maximality: islands split only on window gaps > W, which
            # leaves at least one uncovered token between spans
            assert s2 > e1 + 1, (doc_id, (s1, e1), (s2, e2))


def test_stats_roll_up_from_span_table(spark, sf_dir):
    spans = text_duplicate_spans(spark, sf_dir).collect()
    stats = {r.doc_id: r for r in text_span_dedup_stats(spark, sf_dir).collect()}
    dup = defaultdict(int)
    for r in spans:
        dup[r.doc_id] += r.n_tokens
    n_docs = len(stats)
    assert n_docs > 0 and set(dup) <= set(stats)
    for doc_id, row in stats.items():
        assert row.dup_tokens == dup.get(doc_id, 0)
        assert 0 <= row.dup_tokens <= row.n_tokens
        assert abs(row.dup_frac - round(row.dup_tokens / max(row.n_tokens, 1), 6)) < 1e-12
    # the fixture's planted near-dups must surface as a real dup budget
    assert sum(dup.values()) > 0


def _is_subsequence(small: list[str], big: list[str]) -> bool:
    it = iter(big)
    return all(tok in it for tok in (iter(small)))


def test_clean_transform_invariants(spark, sf_dir):
    from etl_tpch_spark.queries.text import text_span_dedup_clean

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = text_span_dedup_clean(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(docs)
    removed_total = 0
    for r in rows:
        orig = [t for t in docs[r.doc_id].split(" ") if t]
        clean = [t for t in r.clean_text.split(" ") if t]
        # conservation: removed + kept == original token count
        assert r.n_tokens == len(orig)
        assert r.n_removed == len(orig) - len(clean)
        assert 0 <= r.n_removed <= r.n_tokens
        # kept tokens are an order-preserving subsequence of the original
        assert _is_subsequence(clean, orig), r.doc_id
        removed_total += r.n_removed
    # the fixture's planted near-dups must actually get cut somewhere
    assert removed_total > 0
    # first-seen-wins: the globally lowest doc_id can never lose a span
    # (no owner can precede it)
    assert next(r for r in rows if r.doc_id == min(docs)).n_removed == 0
