"""Persisted IVF index (similarity/index.py): build-once/query-many
lifecycle must return bit-identical results to the per-run trained
operator, prune unprobed cells at the scan, and rebuild cleanly."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.queries.similarity import (
    N_CELLS,
    N_IVF_ITERS,
    N_PROBE,
    QUERY_IDS,
    TOP_K,
)
from etl_tpch_spark.similarity.ann import cosine_topk_ivf
from etl_tpch_spark.similarity.index import IVFIndex


def _rows(df):
    return {(r.query_id, r.vec_id, r.cosine, r.rnk) for r in df.collect()}


def test_indexed_topk_identical_to_per_run_operator(spark, sf_dir, tmp_path):
    """Same integer-exact training ⇒ the stored index must reproduce
    cosine_topk_ivf exactly (which transitively keeps the DuckDB
    oracle valid for the indexed registry query)."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex.build(
        str(tmp_path / "ivf"), emb, n_cells=N_CELLS, iters=N_IVF_ITERS
    )
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    got = _rows(idx.topk(spark, queries, TOP_K, n_probe=N_PROBE))
    want = _rows(
        cosine_topk_ivf(
            emb, QUERY_IDS, TOP_K,
            n_cells=N_CELLS, n_probe=N_PROBE, iters=N_IVF_ITERS,
        )
    )
    assert got == want and got


def test_probe_filter_pushes_to_cells_scan(spark, sf_dir, tmp_path):
    """The probed-cells isin filter must reach the parquet scan of the
    inverted file (PushedFilters In(cell, ...)) — with the cell-
    clustered layout that is what skips unprobed files, the IVF read
    pattern."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex.build(
        str(tmp_path / "ivf"), emb, n_cells=N_CELLS, iters=N_IVF_ITERS
    )
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    plan = (
        idx.topk(spark, queries, TOP_K, n_probe=N_PROBE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "In(cell" in plan, plan[:2000]
    # training must NOT appear in the query plan: no kmeans machinery,
    # centroids come from storage
    assert str(tmp_path / "ivf") in plan


def test_clustered_layout_gives_disjoint_cell_ranges(spark, sf_dir, tmp_path):
    """Every inverted-file parquet file owns a disjoint cell range
    (cluster_by compaction) — the property file-skipping relies on."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex.build(
        str(tmp_path / "ivf"), emb, n_cells=N_CELLS, iters=N_IVF_ITERS
    )
    ranges = []
    for fname in idx.cells_t.snapshot_files():
        df = spark.read.parquet(os.path.join(idx.cells_t.path, fname))
        row = df.agg(
            F.min("cell").alias("lo"), F.max("cell").alias("hi")
        ).collect()[0]
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_rebuild_after_corpus_growth(spark, sf_dir, tmp_path):
    """Rebuilding over a grown corpus overwrites the artifacts (old
    version stays time-travelable) and queries see the new vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    path = str(tmp_path / "ivf")

    idx = IVFIndex.build(path, half, n_cells=N_CELLS, iters=N_IVF_ITERS)
    n_half = idx.cells(spark).count()

    idx = IVFIndex.build(path, emb, n_cells=N_CELLS, iters=N_IVF_ITERS)
    n_full = idx.cells(spark).count()
    assert n_full == emb.count() > n_half == half.count()

    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    got = _rows(idx.topk(spark, queries, TOP_K, n_probe=N_PROBE))
    want = _rows(
        cosine_topk_ivf(
            emb, QUERY_IDS, TOP_K,
            n_cells=N_CELLS, n_probe=N_PROBE, iters=N_IVF_ITERS,
        )
    )
    assert got == want


def _split_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") % 4 != 3), emb.filter(
        F.col("vec_id") % 4 == 3
    )


def test_tick_adds_batch_without_retraining(spark, sf_dir, tmp_path):
    """IVFIndex.tick (faiss add() semantics): after build(A) + tick(B)
    the cells table holds A∪B exactly once, B's assignments equal the
    deterministic nearest-stored-centroid rule, and centroids are
    untouched."""
    from etl_tpch_spark.similarity.kmeans import _assign, quantize

    emb, a, b = _split_corpus(spark, sf_dir)
    idx = IVFIndex.build(str(tmp_path / "i"), a, n_cells=N_CELLS)
    cent_before = {
        (r["cent_id"], tuple(r["cv"]))
        for r in idx.centroids(spark).collect()
    }
    idx.tick(spark, b, batch_id="day-2")
    cells = idx.cells(spark)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    want = {
        (r["vec_id"], r["cluster"])
        for r in _assign(quantize(b), idx.centroids(spark)).collect()
    }
    got = {
        (r["vec_id"], r["cell"])
        for r in cells.join(
            b.select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    assert got == want
    assert cent_before == {
        (r["cent_id"], tuple(r["cv"]))
        for r in idx.centroids(spark).collect()
    }


def test_tick_replay_is_noop(spark, sf_dir, tmp_path):
    _, a, b = _split_corpus(spark, sf_dir)
    idx = IVFIndex.build(str(tmp_path / "i"), a, n_cells=N_CELLS)
    idx.tick(spark, b, batch_id="day-2")
    n = idx.cells(spark).count()
    idx.tick(spark, b, batch_id="day-2")  # re-delivered crawl batch
    assert idx.cells(spark).count() == n


def test_ticked_index_equals_batch_assignment_same_centroids(
    spark, sf_dir, tmp_path
):
    """The tick invariant: build(A)+tick(B) answers queries
    IDENTICALLY to an index whose cells were assigned in ONE batch
    pass against the SAME stored centroids — ticks change freshness,
    never semantics (retraining drift is rebuild()'s job)."""
    from etl_tpch_spark.similarity.ann import _with_norm
    from etl_tpch_spark.similarity.kmeans import _assign, quantize

    emb, a, b = _split_corpus(spark, sf_dir)
    idx = IVFIndex.build(str(tmp_path / "ticked"), a, n_cells=N_CELLS)
    idx.tick(spark, b, batch_id="day-2")

    ref = IVFIndex(str(tmp_path / "batch"))
    ref.cent_t.overwrite(idx.centroids(spark))
    assign = _assign(quantize(emb), idx.centroids(spark)).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    ref.cells_t.overwrite(
        _with_norm(emb, "vec_id", "v_emb", "v_norm").join(assign, "vec_id")
    )

    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))

    def res(i):
        return {
            tuple(r)
            for r in i.topk(spark, queries, TOP_K, n_probe=N_PROBE).collect()
        }

    assert res(idx) == res(ref)


def test_filtered_search_through_the_index(spark, sf_dir, tmp_path):
    """Filtered vector search (metadata_cols + where=): results are
    exactly the unfiltered probed-cell candidates restricted to the
    predicate — a true pre-filter (k from the allowed subset), and the
    predicate composes with cell probing inside one cells scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex.build(
        str(tmp_path / "i"), emb, n_cells=N_CELLS,
        metadata_cols=("label",),
    )
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    lab = [r["label"] for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    got = idx.topk(
        spark, queries, TOP_K, n_probe=N_PROBE,
        where=F.col("label") == lab,
    )
    labels = {r["label"] for r in emb.collect()}
    assert len(labels) > 1  # the filter is a real restriction
    allowed = {r["vec_id"] for r in emb.filter(F.col("label") == lab).collect()}
    rows = got.collect()
    assert rows and all(r["vec_id"] in allowed for r in rows)
    # equals rank-over-(candidates ∩ allowed) of the unfiltered probe
    cand = idx.candidates(spark, queries, N_PROBE)
    from pyspark.sql import Window as W

    ref = (
        cand.join(
            emb.filter(F.col("label") == lab).select("vec_id"),
            "vec_id", "left_semi",
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "rnk")
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in ref.collect()}
    # ticks carry the metadata column (schema enforcement would
    # refuse a narrower append)
    more = emb.withColumn(
        "vec_id", (F.col("vec_id") + 100000).cast("long")
    ).limit(20)
    idx.tick(spark, more, batch_id="t1")
    assert "label" in idx.cells(spark).columns
    assert idx.cells(spark).filter(F.col("label").isNull()).count() == 0
