"""Set-level MinHash-LSH band join (round 7): equivalence with the
row-level form it replaced, on both a unique corpus and a
duplication-heavy one.

The rewrite (dedup/operators.py minhash_lsh_pairs) groups documents by
their shingle array before banding — the same duplication-proofing the
Hamming kernel got (banded_hamming_pairs): band join + Jaccard verify
run once per DISTINCT shingle set, id pairs expand afterwards.  Both
banding and verification are pure functions of the shingle array, so
the output must be bit-identical to banding every row.  These tests pin
that equivalence against an inline row-level reference built from the
SAME helpers (signature build + verify), so a drift in either the
set-level grouping or the expansion arithmetic fails loudly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.dedup.operators import (
    _banded_signatures,
    _verify_jaccard,
    minhash_lsh_pairs,
)


def _rowlevel_pairs(docs, threshold):
    """The pre-round-7 row-level form, reconstructed from the shared
    helpers: band every (doc_id, band) row, self-join, distinct,
    verify.  Quadratic in per-bucket duplication — kept here as the
    semantic reference the set-level rewrite must match."""
    sig = _banded_signatures(docs, storage_level=None).localCheckpoint(
        eager=False
    )
    banded = sig.select("doc_id", F.explode("bands").alias("band"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_jaccard(cand, sig, threshold)


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_setlevel_equals_rowlevel_on_unique_corpus(spark, sf_dir):
    """sf0.001 documents are unique texts — every shingle-set group is
    a singleton, so the rewrite must reduce to exactly the old plan's
    output (the no-duplication boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    got = _pairs(minhash_lsh_pairs(docs, 0.5))
    want = _pairs(_rowlevel_pairs(docs, 0.5))
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def duplicated_docs(spark, sf_dir):
    """A crawl-shaped corpus: 40 base documents, each with 4 extra
    byte-identical copies (the dominant duplication class in crawl
    data) plus one near-copy with a trailing token (lands in a
    DIFFERENT shingle-set group — exercises cross-group pairs between
    a group of size 5 and a singleton)."""
    base = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(40)
        .select("doc_id", "text")
    )
    copies = base.select(
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("c"), "doc_id", "text"
    ).select((F.col("doc_id") + F.col("c") * 100_000).alias("doc_id"), "text")
    near = base.select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat("text", F.lit(" trailingtoken extra")).alias("text"),
    )
    return base.unionByName(copies).unionByName(near).localCheckpoint()


def test_setlevel_equals_rowlevel_on_duplicated_corpus(
    spark, duplicated_docs
):
    got = _pairs(minhash_lsh_pairs(duplicated_docs, 0.5))
    want = _pairs(_rowlevel_pairs(duplicated_docs, 0.5))
    assert got == want
    # the duplication actually exercised both expansion paths:
    # within-group pairs (identical copies, jaccard exactly 1.0) and
    # cross-group pairs (base↔near-copy, jaccard < 1.0)
    assert any(j == 1.0 for (_, _, j) in want)
    assert any(j < 1.0 for (_, _, j) in want)


def test_within_group_pairs_are_exact_jaccard_one(spark, duplicated_docs):
    """Each base doc + its 4 copies form a 5-group → C(5,2) = 10 pairs
    per group at Jaccard exactly 1.0 (identical shingle sets)."""
    pairs = minhash_lsh_pairs(duplicated_docs, 0.99)
    ones = pairs.filter(F.col("jaccard") == 1.0).count()
    assert ones == 40 * 10


def test_band_join_sees_distinct_sets_not_rows(spark, duplicated_docs):
    """The scale property itself: the candidate set-pair join runs over
    one representative per distinct shingle array, so the band explode
    must read the GROUPED frame.  The row-level plan this replaced also
    had no CartesianProduct (ADVICE r7), so that alone cannot catch a
    regression — instead pin the band-explode Generate nodes' shape:
    set-level carries set_id from the checkpointed group frame
    (schema [shingles, set_id, bands, ids]); a row-level regression
    would band per-document rows, carrying doc_id with no group
    columns.  The within-group expansion (explode(ids)) existing at
    all is equally set-level-only."""
    import re

    plan = minhash_lsh_pairs(duplicated_docs, 0.5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    band_gens = re.findall(r"Generate explode\(bands#\d+\), \[(\w+)#", plan)
    assert band_gens, "band explode missing from the executed plan"
    assert set(band_gens) == {"set_id"}, band_gens
    # grouped source: every scan feeding the query carries the group
    # members column; the row-level signature frame had none
    assert re.search(r"Generate explode\(ids#\d+\)", plan)
    assert not re.search(r"Generate explode\(bands#\d+\), \[doc_id#", plan)
