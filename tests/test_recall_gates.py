"""Recall gates for every approximate operator (VERDICT r2 #4).

Each approximate product path is measured against its exact bruteforce
twin at sf0.01 (the driver's correctness scale) with an explicit pinned
floor — a banding/cell/probe regression trips a NUMBER, not a vibe.

The floors are regression tripwires, not quality claims: the synthetic
embeddings are near-random (little cosine structure), so single-probe
LSH at 8 bucket bits legitimately recalls only a few percent of the
true top-k (it scans 1/256 of the corpus); what the gate pins is that
the mechanism keeps working — multiprobe must beat single-probe, cells
must recover a third of exact pairs, and any change that silently
breaks bucketing/banding drops these to ~0 and fails loudly.  IVF's
stronger 0.7 floor (trained cells, 4/16 probe) lives in
test_operators_unit.py::test_ivf_trained_recall_vs_bruteforce.

Precision is exact by construction for the pair/cluster paths (cells
verify with exact cosine, so emitted pairs ⊆ exact pairs) — asserted
as a subset, which also pins that approximation only LOSES pairs,
never invents them.
"""

from __future__ import annotations

import os
from collections import defaultdict
from itertools import combinations

import pytest

RECALL_SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RECALL_SF_DIR), reason="sf0.01 fixtures absent"
)


@pytest.fixture(scope="module")
def emb(spark):
    from etl_tpch_spark.catalog import load_table

    return load_table(spark, RECALL_SF_DIR, "embeddings")


def _topk_set(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def _pair_set(df):
    return {(r.vec_a, r.vec_b) for r in df.collect()}


@pytest.fixture(scope="module")
def brute_topk(spark, emb):
    from etl_tpch_spark.queries.similarity import QUERY_IDS, TOP_K
    from etl_tpch_spark.similarity.ann import cosine_topk_bruteforce

    return _topk_set(cosine_topk_bruteforce(emb, QUERY_IDS, TOP_K))


@pytest.fixture(scope="module")
def exact_pairs(spark, emb):
    from etl_tpch_spark.queries.similarity import PAIR_THRESHOLD
    from etl_tpch_spark.similarity.ann import cosine_pairs_threshold

    return _pair_set(cosine_pairs_threshold(emb, PAIR_THRESHOLD))


def test_lsh_topk_recall_floor(spark, emb, brute_topk):
    """Single-probe LSH at the registered 8 bucket bits: measured 0.04
    on the synthetic corpus; floor 0.02 (bucketing broken ⇒ ~0)."""
    from etl_tpch_spark.queries.similarity import (
        BUCKET_BITS,
        QUERY_IDS,
        TOP_K,
    )
    from etl_tpch_spark.similarity.ann import cosine_topk_lsh

    got = _topk_set(cosine_topk_lsh(emb, QUERY_IDS, TOP_K, BUCKET_BITS))
    recall = len(brute_topk & got) / len(brute_topk)
    assert recall >= 0.02, f"lsh recall {recall:.3f} < 0.02"


def test_multiprobe_recall_floor_and_beats_single_probe(
    spark, emb, brute_topk
):
    """Multi-probe (own bucket + all Hamming-1 buckets): measured 0.22;
    floor 0.12, and it must strictly dominate single-probe — the probe
    expansion is the whole point of the operator."""
    from etl_tpch_spark.queries.similarity import (
        BUCKET_BITS,
        QUERY_IDS,
        TOP_K,
    )
    from etl_tpch_spark.similarity.ann import (
        cosine_topk_lsh,
        cosine_topk_lsh_multiprobe,
    )

    single = _topk_set(cosine_topk_lsh(emb, QUERY_IDS, TOP_K, BUCKET_BITS))
    multi = _topk_set(
        cosine_topk_lsh_multiprobe(emb, QUERY_IDS, TOP_K, BUCKET_BITS)
    )
    r_single = len(brute_topk & single) / len(brute_topk)
    r_multi = len(brute_topk & multi) / len(brute_topk)
    assert r_multi >= 0.12, f"multiprobe recall {r_multi:.3f} < 0.12"
    assert r_multi >= r_single, (r_multi, r_single)


def test_cells_pairs_recall_floor_and_exact_precision(
    spark, emb, exact_pairs
):
    """Cell-scoped pairs (the SemDeDup product path): measured 0.46 at
    the registered threshold; floor 0.30.  Precision is exact — every
    emitted pair is verified with exact cosine, so the emitted set must
    be a SUBSET of the bruteforce pairs."""
    from etl_tpch_spark.queries.similarity import PAIR_THRESHOLD
    from etl_tpch_spark.similarity.ann import cosine_pairs_threshold_cells

    got = _pair_set(cosine_pairs_threshold_cells(emb, PAIR_THRESHOLD))
    recall = len(exact_pairs & got) / len(exact_pairs)
    assert recall >= 0.30, f"cells recall {recall:.3f} < 0.30"
    assert got <= exact_pairs, "cells emitted a pair bruteforce did not"


def test_quantized_cells_pairs_recall_floor_and_exact_precision(
    spark, emb
):
    """Int8-quantized cell-scoped pairs (the compressed-embedding
    product path, r4 VERDICT #1): measured 0.47 at the registered
    threshold vs the all-pairs quantized twin; floor 0.30 (same cells
    as the float kernel).  Precision is exact — within-cell scoring
    is the exact integer dot, so emitted pairs ⊆ all-pairs twin."""
    from etl_tpch_spark.queries.similarity import PAIR_THRESHOLD
    from etl_tpch_spark.similarity.ann import (
        quantized_cosine_pairs,
        quantized_cosine_pairs_cells,
    )

    exact = _pair_set(quantized_cosine_pairs(emb, PAIR_THRESHOLD))
    got = _pair_set(quantized_cosine_pairs_cells(emb, PAIR_THRESHOLD))
    recall = len(exact & got) / len(exact)
    assert recall >= 0.30, f"quantized cells recall {recall:.3f} < 0.30"
    assert got <= exact, "cells emitted a pair the all-pairs twin did not"


def _co_membership_pairs(rows):
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r.vec_id)
    return {
        tuple(sorted(p))
        for members in clusters.values()
        for p in combinations(members, 2)
    }


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): >9 s recall sweep
def test_embedding_clusters_co_membership_recall_floor(spark):
    """SemDeDup clusters vs the all-pairs twin, compared on
    co-membership pairs (label-invariant): measured 0.35; floor 0.22.
    Cells edges ⊆ exact edges ⇒ cells co-pairs ⊆ bruteforce co-pairs
    (approximation loses pairs, never invents them) — asserted."""
    from etl_tpch_spark.registry import queries

    qs = queries()
    bf = _co_membership_pairs(
        qs["dedup_embedding_clusters_bruteforce"](spark, RECALL_SF_DIR)
        .collect()
    )
    cells = _co_membership_pairs(
        qs["dedup_embedding_clusters"](spark, RECALL_SF_DIR).collect()
    )
    recall = len(bf & cells) / len(bf)
    assert recall >= 0.22, f"cluster co-pair recall {recall:.3f} < 0.22"
    assert cells <= bf, "cells co-clustered a pair bruteforce did not"


def test_matryoshka_topk_recall_floor(spark, emb, brute_topk):
    """Two-stage prefix-cosine cascade: measured 0.32 on the synthetic
    corpus (floor 0.20).  The synthetic embeddings are NOT trained
    front-loaded (no MRL objective), so the 8-dim prefix carries only
    8/64 of random variance — on real matryoshka embeddings the
    prefix is engineered to carry most of it; the gate pins the
    cascade mechanism (candidate cut + exact rerank), not MRL
    training quality.  Precision side: every returned pair's cosine
    is the exact full-dim fold, so returned ∩ brute is score-correct
    by construction."""
    from etl_tpch_spark.queries.similarity import QUERY_IDS, TOP_K
    from etl_tpch_spark.similarity.ann import cosine_topk_matryoshka

    got = _topk_set(cosine_topk_matryoshka(emb, QUERY_IDS, TOP_K))
    recall = len(brute_topk & got) / len(brute_topk)
    assert recall >= 0.20, recall


def test_pq_topk_recall_floor(spark, emb):
    """PQ/ADC vs exact top-k in the SAME quantized-L2 space (the
    honest reference — cosine would conflate metric change with
    quantization loss): measured 0.36 at 16 codes × 8 subspaces on
    the synthetic corpus; floor 0.20.  A codebook/LUT indexing bug
    (wrong subspace order, off-by-one code) drops this to ~0."""
    from etl_tpch_spark.queries.similarity import QUERY_IDS, TOP_K
    from etl_tpch_spark.similarity.pq import l2_topk_exact, pq_topk

    got = _topk_set(pq_topk(emb, QUERY_IDS, TOP_K))
    ref = _topk_set(l2_topk_exact(emb, QUERY_IDS, TOP_K))
    recall = len(got & ref) / len(ref)
    assert recall >= 0.20, recall


def test_ivfpq_topk_recall_floor(spark, emb):
    """IVF-PQ (4/16 cells probed + residual codebooks) vs exact
    quantized-L2: measured 0.34 — residual encoding recovers most of
    what cell-probe loss takes (plain PQ measures 0.36 with NO probe
    pruning); floor 0.20."""
    from etl_tpch_spark.queries.similarity import QUERY_IDS, TOP_K
    from etl_tpch_spark.similarity.pq import ivfpq_topk, l2_topk_exact

    got = _topk_set(ivfpq_topk(emb, QUERY_IDS, TOP_K))
    ref = _topk_set(l2_topk_exact(emb, QUERY_IDS, TOP_K))
    recall = len(got & ref) / len(ref)
    assert recall >= 0.20, recall


def test_indexed_negatives_hard_recall_floor(spark, emb, tmp_path):
    """Index-served hard-negative mining (IVFIndex.negatives) vs the
    full-scan sampler (contrastive_negatives): the hard stratum drawn
    from 4/16 probed cells must recover most of the true hardest
    negatives — measured 0.84 at sf0.01 (and at sf0.001); floor 0.6.
    A probe/cell regression collapses the candidate pool and drops
    this toward the 4/16 scan fraction (~0.25).  The easy stratum is
    pool-sampled by design (different addressing than the baseline's
    corpus-wide sampler), so only the hard stratum is gated; both
    strata are hash-checked end-to-end by the registry oracle."""
    from pyspark.sql import functions as F

    from etl_tpch_spark.queries.similarity import (
        N_CELLS,
        N_IVF_ITERS,
        N_PROBE,
        NEG_DUP_T,
        NEG_K_EASY,
        NEG_K_HARD,
        NEG_POOL,
        QUERY_IDS,
    )
    from etl_tpch_spark.similarity.ann import contrastive_negatives
    from etl_tpch_spark.similarity.index import IVFIndex

    base = contrastive_negatives(
        emb, QUERY_IDS,
        dup_threshold=NEG_DUP_T, k_hard=NEG_K_HARD, k_easy=NEG_K_EASY,
    )
    idx = IVFIndex.build(
        str(tmp_path / "ivf-neg"), emb,
        n_cells=N_CELLS, iters=N_IVF_ITERS,
    )
    got = idx.negatives(
        spark,
        emb.filter(F.col("vec_id").isin(QUERY_IDS)),
        dup_threshold=NEG_DUP_T, k_hard=NEG_K_HARD, k_easy=NEG_K_EASY,
        n_probe=N_PROBE, pool_size=NEG_POOL,
    )

    def hard_set(df):
        return {
            (r["query_id"], r["vec_id"])
            for r in df.filter(F.col("stratum") == "hard").collect()
        }

    ref, mined = hard_set(base), hard_set(got)
    recall = len(ref & mined) / len(ref)
    assert recall >= 0.6, recall
    # every mined pair is verified below-threshold exact cosine —
    # the sampler can lose hard negatives, never invent positives
    assert got.filter(F.col("cosine") >= NEG_DUP_T).count() == 0
