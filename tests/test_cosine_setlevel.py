"""Distinct-vector (set-level) cosine pair kernels (round 7): the cell
kernels score one representative per distinct embedding array and
expand member id pairs afterwards — the embedding twin of the
shingle-set MinHash banding and the hash-level Hamming banding.  Exact
text copies carry exact embedding copies, so a crawl corpus duplicates
vectors the way it duplicates documents; a row-scoring kernel does
O(Σg²) work per g-sized copy group INSIDE every cell block.

Equivalence is pinned against the same kernels with
``dedup_vectors=False`` (the pre-rewrite row-level path, kept as the
reference semantics) on a unique corpus, a duplicated one, and the
zero-vector edge the NaN-drop rule covers.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.similarity.ann import (
    cosine_pairs_threshold_cells,
    quantized_cosine_pairs_cells,
)

THRESH = 0.8


def _pairs(df, val):
    return {(r.vec_a, r.vec_b, r[val]) for r in df.collect()}


def test_float_cells_setlevel_equals_rowlevel_unique(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = _pairs(cosine_pairs_threshold_cells(emb, THRESH), "cosine")
    want = _pairs(
        cosine_pairs_threshold_cells(emb, THRESH, dedup_vectors=False),
        "cosine",
    )
    assert got == want


@pytest.fixture(scope="module")
def duplicated_emb(spark, sf_dir):
    """30 base vectors, each with 3 extra byte-identical copies, plus
    one all-zero group of 3 (the NaN-drop edge: identical zero vectors
    must NOT pair — their cosine is undefined in both paths)."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .limit(30)
        .select("vec_id", "embedding")
    )
    dim = len(base.first().embedding)
    copies = base.select(
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("c"),
        "vec_id",
        "embedding",
    ).select(
        (F.col("vec_id") + F.col("c") * 100_000).alias("vec_id"),
        "embedding",
    )
    zeros = spark.range(3).select(
        (F.col("id") + 900_000).alias("vec_id"),
        F.array(*[F.lit(0.0).cast("float") for _ in range(dim)]).alias(
            "embedding"
        ),
    )
    return (
        base.unionByName(copies).unionByName(zeros).localCheckpoint()
    )


def test_float_cells_setlevel_equals_rowlevel_duplicated(
    spark, duplicated_emb
):
    got = _pairs(
        cosine_pairs_threshold_cells(duplicated_emb, THRESH), "cosine"
    )
    want = _pairs(
        cosine_pairs_threshold_cells(
            duplicated_emb, THRESH, dedup_vectors=False
        ),
        "cosine",
    )
    assert got == want
    # both expansion paths actually exercised: within-group pairs at
    # cosine exactly 1.0 (4-copy groups → C(4,2)=6 pairs each) and the
    # zero-vector group contributed nothing
    assert sum(1 for (_, _, c) in want if c == 1.0) >= 30 * 6
    zero_ids = {900_000, 900_001, 900_002}
    assert not any(
        a in zero_ids or b in zero_ids for (a, b, _) in got
    )


def test_quantized_cells_setlevel_equals_rowlevel_duplicated(
    spark, duplicated_emb
):
    got = _pairs(
        quantized_cosine_pairs_cells(duplicated_emb, THRESH), "qcosine"
    )
    want = _pairs(
        quantized_cosine_pairs_cells(
            duplicated_emb, THRESH, dedup_vectors=False
        ),
        "qcosine",
    )
    assert got == want
    assert any(c == 1.0 for (_, _, c) in want)
    zero_ids = {900_000, 900_001, 900_002}
    assert not any(
        a in zero_ids or b in zero_ids for (a, b, _) in got
    )


def test_quantized_cells_setlevel_equals_rowlevel_unique(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = _pairs(quantized_cosine_pairs_cells(emb, THRESH), "qcosine")
    want = _pairs(
        quantized_cosine_pairs_cells(emb, THRESH, dedup_vectors=False),
        "qcosine",
    )
    assert got == want
