"""Property-based check: SearchIndex results are invariant to HOW the
corpus was split into ingest batches — one batch, per-doc batches, or
any arbitrary partition must produce identical postings, doclens and
BM25 rankings.  Batching-invariance is the load-bearing property of
every persisted index in this repo (a daily-crawl index is nothing
but an arbitrary batching of the corpus), and the partition edges
(singleton batches, empty batches, skewed splits) are exactly what a
fixed two-batch test can miss."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.search_index import SearchIndex
from etl_tpch_spark.queries.text import _BM25_TERMS, _BM25_TOPK

N_DOCS = 40  # corpus slice kept small: each example builds an index


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    assignment=st.lists(
        st.integers(min_value=0, max_value=3),
        min_size=N_DOCS,
        max_size=N_DOCS,
    )
)
def test_search_invariant_to_ingest_batching(
    spark, sf_dir, tmp_path_factory, assignment
):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_DOCS
    )
    base = tmp_path_factory.mktemp("inv")
    ref = SearchIndex(str(base / "one_shot"))
    ref.ingest(docs, batch_id="all")
    want = [
        tuple(r)
        for r in ref.search(spark, _BM25_TERMS, _BM25_TOPK).collect()
    ]

    idx = SearchIndex(str(base / "batched"))
    ids_by_batch: dict[int, list[int]] = {}
    for doc_id, b in enumerate(assignment):
        ids_by_batch.setdefault(b, []).append(doc_id)
    for b in sorted(ids_by_batch):
        batch = docs.filter(F.col("doc_id").isin(ids_by_batch[b]))
        idx.ingest(batch, batch_id=f"b{b}")
    got = [
        tuple(r)
        for r in idx.search(spark, _BM25_TERMS, _BM25_TOPK).collect()
    ]
    assert got == want
    # stored doclens cover every doc exactly once regardless of split
    assert idx.doclens.read(spark).count() == N_DOCS


VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon"]


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    masks=st.lists(
        st.integers(min_value=0, max_value=31), min_size=20, max_size=60
    ),
    tick_masks=st.lists(
        st.integers(min_value=0, max_value=31), min_size=0, max_size=12
    ),
    qmask=st.integers(min_value=1, max_value=31),
    topk=st.integers(min_value=1, max_value=8),
)
def test_maxscore_exact_on_random_corpora(
    spark, tmp_path_factory, masks, tick_masks, qmask, topk
):
    """MaxScore admissibility as a PROPERTY: for arbitrary corpora
    (arbitrary term co-occurrence, including empty docs), an arbitrary
    post-optimize tick (stale-LOW termstats), any query subset and any
    k, search_pruned returns EXACTLY search()'s top-k.  The fixed
    tests pin the engineered stopword shape; this pins the bound's
    soundness where hand-built corpora can't reach — ties at theta,
    all-rare queries, every-term-everywhere queries, k > matches."""

    def text_of(mask: int) -> str:
        return " ".join(w for j, w in enumerate(VOCAB) if mask >> j & 1)

    base = tmp_path_factory.mktemp("ms")
    idx = SearchIndex(str(base / "inv"))
    idx.ingest(
        spark.createDataFrame(
            [(i, text_of(m)) for i, m in enumerate(masks)],
            "doc_id LONG, text STRING",
        ),
        batch_id="b0",
    )
    idx.optimize(spark)
    if tick_masks:
        idx.ingest(
            spark.createDataFrame(
                [
                    (1000 + i, text_of(m))
                    for i, m in enumerate(tick_masks)
                ],
                "doc_id LONG, text STRING",
            ),
            batch_id="b1",
        )
    terms = [w for j, w in enumerate(VOCAB) if qmask >> j & 1]
    got = [
        tuple(r) for r in idx.search_pruned(spark, terms, topk).collect()
    ]
    want = [tuple(r) for r in idx.search(spark, terms, topk).collect()]
    assert got == want
