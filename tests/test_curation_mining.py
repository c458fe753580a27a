"""Invariant tests for the CCNet-style LM filter and the contrastive
negative-mining sampler — properties the hash oracle can't articulate
(the oracle proves bit-equality; these prove the SEMANTICS the two
operators exist for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import Tables
from etl_tpch_spark.queries.similarity import (
    NEG_DUP_T,
    NEG_K_EASY,
    NEG_K_HARD,
    QUERY_IDS,
)
from etl_tpch_spark.queries.text import (
    _LM_REF_SOURCE,
    text_lm_quality_filter,
)
from etl_tpch_spark.similarity.ann import (
    contrastive_negatives,
    cosine_pairs_threshold,
)


def test_contrastive_negatives_strata_invariants(spark, sf_dir):
    t = Tables(spark, sf_dir)
    out = contrastive_negatives(
        t.embeddings,
        QUERY_IDS,
        dup_threshold=NEG_DUP_T,
        k_hard=NEG_K_HARD,
        k_easy=NEG_K_EASY,
    ).collect()

    by_q: dict[int, dict[str, list]] = {}
    for r in out:
        by_q.setdefault(r.query_id, {"hard": [], "easy": []})[
            r.stratum
        ].append(r)

    assert set(by_q) == set(QUERY_IDS)
    for qid, strata in by_q.items():
        hard, easy = strata["hard"], strata["easy"]
        # exact stratum sizes (corpus is big enough at every fixture)
        assert len(hard) == NEG_K_HARD and len(easy) == NEG_K_EASY
        # NO positive leaks into either stratum — the poisoning guard
        assert all(r.cosine < NEG_DUP_T for r in hard + easy)
        # self is never a negative
        assert all(r.vec_id != qid for r in hard + easy)
        # strata are disjoint
        assert not {r.vec_id for r in hard} & {r.vec_id for r in easy}
        # hard = the TOP of the non-positive pool: every hard cosine
        # >= every easy cosine (ties broken by vec_id inside the rank)
        assert min(r.cosine for r in hard) >= max(
            r.cosine for r in easy
        )
        # ranks are 1..k dense within each stratum
        assert sorted(r.rnk for r in hard) == list(
            range(1, NEG_K_HARD + 1)
        )
        assert sorted(r.rnk for r in easy) == list(
            range(1, NEG_K_EASY + 1)
        )


def test_contrastive_negatives_exclusions_match_pair_operator(
    spark, sf_dir
):
    """The excluded positives are exactly the near-dup pairs the pair
    operator reports at the same threshold (restricted to the query
    set) — the two operators share one notion of 'positive'."""
    t = Tables(spark, sf_dir)
    pairs = cosine_pairs_threshold(t.embeddings, NEG_DUP_T).collect()
    positives = {
        (a, b)
        for r in pairs
        for a, b in ((r.vec_a, r.vec_b), (r.vec_b, r.vec_a))
        if a in QUERY_IDS
    }
    mined = contrastive_negatives(
        t.embeddings,
        QUERY_IDS,
        dup_threshold=NEG_DUP_T,
        k_hard=NEG_K_HARD,
        k_easy=NEG_K_EASY,
    ).collect()
    mined_pairs = {(r.query_id, r.vec_id) for r in mined}
    assert not positives & mined_pairs


def test_lm_filter_reference_scores_in_domain_higher(spark, sf_dir):
    """Docs from the LM's own training source must out-score the rest
    on average — the filter's reason to exist (in-domain text is more
    probable under an in-domain LM).  Also pins coverage semantics:
    every doc row appears, scores are non-negative, keep ≡ the floor
    predicate."""
    out = text_lm_quality_filter(spark, sf_dir).collect()
    n_docs = (
        Tables(spark, sf_dir)
        .documents.filter(F.size(F.split("text", " ")) >= 2)
        .count()
    )
    assert len(out) == n_docs
    ref = [r.avg_p_micro for r in out if r.source == _LM_REF_SOURCE]
    rest = [r.avg_p_micro for r in out if r.source != _LM_REF_SOURCE]
    assert ref and rest
    assert sum(ref) / len(ref) > sum(rest) / len(rest)
    for r in out:
        assert r.avg_p_micro >= 0
        assert 0 <= r.covered_bigrams <= r.n_bigrams
        assert r.keep == (r.avg_p_micro >= 33000)
