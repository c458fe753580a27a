"""Streaming IVF ticks (streaming/ivf_index.py): staged vector files →
checkpointed stream → one IVFIndex.tick per micro-batch, exactly-once,
query-identical to one-pass batch assignment with the same centroids."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.queries.similarity import (
    N_CELLS,
    N_PROBE,
    QUERY_IDS,
    TOP_K,
)
from etl_tpch_spark.similarity.index import IVFIndex
from etl_tpch_spark.streaming.ivf_index import stream_ivf_ticks


def _stage(vecs, path: str, day: int) -> None:
    vecs.select("vec_id", "embedding").coalesce(1).write.mode(
        "overwrite"
    ).json(os.path.join(path, f"day{day}.json"))


def test_stream_ticks_extend_the_index(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 != 3)
    b = emb.filter(F.col("vec_id") % 4 == 3)
    ipath = str(tmp_path / "ivf")
    idx = IVFIndex.build(ipath, a, n_cells=N_CELLS)
    stage = str(tmp_path / "vectors")
    _stage(b, stage, 1)

    stream_ivf_ticks(spark, stage, ipath, str(tmp_path / "ckpt"))
    assert idx.cells(spark).count() == emb.count()

    # query-identical to batch assignment with the same centroids:
    # the ticked rows carry the deterministic nearest-centroid cell
    from etl_tpch_spark.similarity.kmeans import _assign, quantize

    want = {
        (r["vec_id"], r["cluster"])
        for r in _assign(quantize(b), idx.centroids(spark)).collect()
    }
    got = {
        (r["vec_id"], r["cell"])
        for r in idx.cells(spark)
        .join(b.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert got == want
    # and the index answers over the full corpus
    res = idx.topk(
        spark,
        emb.filter(F.col("vec_id").isin(QUERY_IDS)),
        TOP_K,
        n_probe=N_PROBE,
    )
    assert res.groupBy("query_id").count().agg(
        F.min("count")
    ).first()[0] == TOP_K


def test_stream_replay_and_rebundle_are_noops(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 != 3)
    b = emb.filter(F.col("vec_id") % 4 == 3)
    ipath = str(tmp_path / "ivf")
    idx = IVFIndex.build(ipath, a, n_cells=N_CELLS)
    stage = str(tmp_path / "vectors")
    _stage(b, stage, 1)
    stream_ivf_ticks(spark, stage, ipath, str(tmp_path / "ckpt"))
    n = idx.cells(spark).count()
    v = idx.cells_t.latest_version()
    # same checkpoint, nothing new staged → no-op
    stream_ivf_ticks(spark, stage, ipath, str(tmp_path / "ckpt"))
    assert idx.cells(spark).count() == n
    # WIPED checkpoint (same name — the batch id embeds it) over the
    # same files → the content fingerprint still recognizes the batch;
    # index unchanged
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    stream_ivf_ticks(spark, stage, ipath, str(tmp_path / "ckpt"))
    assert idx.cells(spark).count() == n
    assert idx.cells_t.latest_version() == v
