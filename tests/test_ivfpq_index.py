"""Persisted IVF-PQ index (similarity/pq.py IVFPQIndex): stored-index
results equal the per-run operator bit-for-bit, probes scan only the
probed cells' code files, and queries never touch embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.queries.similarity import QUERY_IDS, TOP_K
from etl_tpch_spark.similarity.pq import IVFPQIndex, ivfpq_topk


def _build(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFPQIndex.build(str(tmp_path / "ivfpq"), emb)
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    return emb, idx, queries


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): IVFPQ lifecycle remainder
def test_stored_index_equals_per_run_operator(spark, sf_dir, tmp_path):
    emb, idx, queries = _build(spark, sf_dir, tmp_path)
    got = sorted(
        map(tuple, idx.topk(spark, queries, TOP_K).collect())
    )
    want = sorted(
        map(tuple, ivfpq_topk(emb, QUERY_IDS, TOP_K).collect())
    )
    assert got == want and got


def test_probe_scans_subset_of_code_files(spark, sf_dir, tmp_path):
    """The clustered layout + manifest stats must let a probe open
    fewer code files than the full inverted file holds, and no
    embeddings parquet may appear in the scan."""
    emb, idx, queries = _build(spark, sf_dir, tmp_path)
    result = idx.topk(spark, queries, TOP_K)
    opened = set(result.inputFiles())
    all_files = {
        f for f in idx.codes_t.snapshot_files()
    }
    opened_codes = {
        f for f in opened if "/codes/" in f
    }
    assert 0 < len(opened_codes) < len(all_files) or len(all_files) <= 1
    assert all("embeddings.parquet" not in f for f in opened)


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): IVFPQ lifecycle remainder
def test_rebuild_overwrites_and_time_travels(spark, sf_dir, tmp_path):
    emb, idx, queries = _build(spark, sf_dir, tmp_path)
    before = sorted(
        map(tuple, idx.topk(spark, queries, TOP_K).collect())
    )
    idx2 = IVFPQIndex.build(idx.path, emb)  # rebuild, same data
    after = sorted(
        map(tuple, idx2.topk(spark, queries, TOP_K).collect())
    )
    assert after == before  # deterministic training ⇒ same index
    # prior codes snapshot still readable (versioned overwrite)
    assert idx2.codes_t.latest_version() > 1


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): IVFPQ lifecycle remainder
def test_tick_encodes_with_stored_artifacts(spark, sf_dir, tmp_path):
    """IVFPQIndex.tick (faiss add()): build(A) + tick(B) leaves the
    code table holding A∪B exactly once, with B's rows bit-identical
    to encode_batch against the stored centroids/codebooks, and
    queries answered identically to a code table assembled in one
    batch pass from the same artifacts."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 != 3)
    b = emb.filter(F.col("vec_id") % 4 == 3)
    idx = IVFPQIndex.build(str(tmp_path / "ticked"), a)
    idx.tick(spark, b, batch_id="day-2")
    codes = idx.codes_t.read(spark)
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()

    want = {
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in idx.encode_batch(spark, b).collect()
    }
    got = {
        (r["vec_id"], r["cell"], tuple(r["codes"]))
        for r in codes.join(
            b.select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    assert got == want

    # replay no-op
    v = idx.codes_t.latest_version()
    idx.tick(spark, b, batch_id="day-2")
    assert idx.codes_t.latest_version() == v
    assert idx.codes_t.read(spark).count() == emb.count()

    # one-pass reference with the SAME stored artifacts
    import shutil

    shutil.copytree(str(tmp_path / "ticked"), str(tmp_path / "batch"))
    ref = IVFPQIndex(str(tmp_path / "batch"))
    ref.codes_t.overwrite(idx.encode_batch(spark, emb))
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))

    def res(i):
        return {
            tuple(r) for r in i.topk(spark, queries, TOP_K).collect()
        }

    assert res(idx) == res(ref)
