"""Persisted MinHash signature index (dedup/index.py): the daily-crawl
tick must be O(new batch) — sign only the new docs, reuse stored
signatures for the corpus — while producing exactly the stateless
operator's output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.dedup.index import MinHashIndex
from etl_tpch_spark.dedup.operators import minhash_lsh_pairs_incremental


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_indexed_tick_equals_stateless_incremental(spark, sf_dir, tmp_path):
    """The index-fed path must produce exactly the stateless
    incremental operator's pairs — the batch-equivalence contract
    (test_operators_unit.py) then transitively covers the index."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    got = _pairs(idx.tick(spark, new, 0.5, batch_id="day1"))
    want = _pairs(minhash_lsh_pairs_incremental(corpus, new, 0.5))
    assert got == want
    assert got  # non-vacuous: fixture has cross-parity near-dups


def test_second_tick_plan_scans_index_not_corpus_text(spark, sf_dir, tmp_path):
    """THE scale contract (VERDICT r2 #1): after ingest, the pair
    query's plan reads the stored index parquet — no shingling/minhash
    over corpus text.  The only documents scan left is the new batch's
    doc_id projection (column-pruned: no text column read at all)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    idx.ingest(new, batch_id="day1")

    pairs = idx.pairs_touching(spark, new.select("doc_id"), 0.5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()

    # the index parquet feeds the plan (band join + verify sides)
    assert str(tmp_path / "idx") in plan
    # zero re-signing: the minhash/shingle machinery (md5 token hashes,
    # aggregate fold) never appears — signatures come from storage
    assert "md5" not in plan
    assert "aggregate(" not in plan
    # the only documents.parquet scan projects doc_id alone (no text)
    doc_scans = [
        ln
        for ln in plan.splitlines()
        if "documents.parquet" in ln or "documents" in ln and "FileScan" in ln
    ]
    for ln in doc_scans:
        assert "text" not in ln, ln


def test_replayed_batch_ingests_nothing(spark, sf_dir, tmp_path):
    """Exactly-once: re-ingesting a recorded batch_id is a no-op — the
    crash-replay contract a daily crawl pipeline needs."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.ingest(corpus, batch_id="day0")
    n_after_day0 = idx.signatures(spark).count()
    idx.ingest(corpus, batch_id="day0")  # replay
    assert idx.signatures(spark).count() == n_after_day0

    first = _pairs(idx.tick(spark, new, 0.5, batch_id="day1"))
    n_after_day1 = idx.signatures(spark).count()
    replay = _pairs(idx.tick(spark, new, 0.5, batch_id="day1"))
    assert first == replay
    assert idx.signatures(spark).count() == n_after_day1  # no double rows


def test_multi_tick_accretion_and_compaction(spark, sf_dir, tmp_path):
    """Three daily ticks accrete signature rows monotonically; compact
    keeps the snapshot identical while shrinking the file count."""
    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    idx = MinHashIndex(str(tmp_path / "idx"))
    counts = []
    for i, b in enumerate(batches):
        idx.tick(spark, b, 0.5, batch_id=f"day{i}").count()
        counts.append(idx.signatures(spark).count())
    assert counts == sorted(counts) and counts[0] > 0

    n_files_before = len(idx.table.snapshot_files())
    idx.compact(spark, target_files=1)
    assert len(idx.table.snapshot_files()) == 1 <= n_files_before
    assert idx.signatures(spark).count() == counts[-1]


def test_banded_signatures_storage_level_parameter(spark, sf_dir):
    """VERDICT r2 #3: the signature frame's storage level is a
    parameter — MEMORY_AND_DISK default (spill, never recompute),
    DISK_ONLY option, None skips persistence for single-pass writers."""
    from pyspark.storagelevel import StorageLevel

    from etl_tpch_spark.dedup.operators import _banded_signatures

    docs = load_table(spark, sf_dir, "documents").limit(20)

    default = _banded_signatures(docs)
    assert default.storageLevel == StorageLevel.MEMORY_AND_DISK
    default.unpersist()

    disk = _banded_signatures(docs, storage_level=StorageLevel.DISK_ONLY)
    assert disk.storageLevel == StorageLevel.DISK_ONLY
    disk.unpersist()

    none = _banded_signatures(docs, storage_level=None)
    assert not none.storageLevel.useMemory and not none.storageLevel.useDisk
