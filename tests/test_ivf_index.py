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
