"""Streaming daily-crawl dedup (streaming/dedup_index.py): crawl files
→ checkpointed stream → one MinHashIndex tick per micro-batch, pairs
accumulated exactly-once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.dedup.operators import minhash_lsh_pairs
from etl_tpch_spark.streaming.dedup_index import (
    accumulated_pairs,
    stream_dedup_ticks,
)


def _stage_crawl(spark, docs, crawl_dir: str, day: int) -> None:
    docs.select("doc_id", "text").coalesce(1).write.mode("overwrite").json(
        os.path.join(crawl_dir, f"day{day}.json")
    )


def _pair_set(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_stream_ticks_accumulate_batch_pairs(spark, sf_dir, tmp_path):
    """Two crawl days drained through stream ticks must accumulate
    exactly the batch operator's pair set over the full corpus (pairs
    touching day1 ∪ pairs touching day2 = all pairs, since every doc
    arrives in some tick)."""
    docs = load_table(spark, sf_dir, "documents")
    crawl = str(tmp_path / "crawl")
    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 0), crawl, 1)

    stream_dedup_ticks(
        spark, crawl, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 1), crawl, 2)
    stream_dedup_ticks(
        spark, crawl, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )

    got = _pair_set(accumulated_pairs(spark, str(tmp_path / "pairs")))
    want = _pair_set(minhash_lsh_pairs(docs, 0.5))
    assert got == want and got


def test_rerun_with_same_checkpoint_is_noop(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: draining again with nothing new
    staged re-ingests nothing and re-emits nothing."""
    docs = load_table(spark, sf_dir, "documents")
    crawl = str(tmp_path / "crawl")
    _stage_crawl(spark, docs, crawl, 1)

    args = (
        spark, crawl, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    stream_dedup_ticks(*args)
    first = _pair_set(accumulated_pairs(spark, str(tmp_path / "pairs")))
    from etl_tpch_spark.dedup.index import MinHashIndex

    n_sigs = MinHashIndex(str(tmp_path / "idx")).signatures(spark).count()

    stream_dedup_ticks(*args)  # nothing new staged
    assert _pair_set(
        accumulated_pairs(spark, str(tmp_path / "pairs"))
    ) == first
    assert (
        MinHashIndex(str(tmp_path / "idx")).signatures(spark).count()
        == n_sigs
    )


def test_replayed_epoch_appends_nothing(spark, sf_dir, tmp_path):
    """The foreachBatch replay window (crash between sink commit and
    checkpoint advance): re-running a tick with the SAME epoch batch_id
    must no-op on both the index and the pairs table."""
    from etl_tpch_spark.dedup.index import MinHashIndex
    from etl_tpch_spark.pipeline.txlog import TxTable

    docs = load_table(spark, sf_dir, "documents").limit(100)
    idx = MinHashIndex(str(tmp_path / "idx"))
    pairs_t = TxTable(str(tmp_path / "pairs"))

    bid = "ckpt-0"
    pairs = idx.tick(spark, docs, 0.5, batch_id=bid)
    pairs_t.append(pairs, batch_id=bid)
    n_pairs = pairs_t.read(spark).count()
    n_sigs = idx.signatures(spark).count()

    # replay the whole tick body
    pairs2 = idx.tick(spark, docs, 0.5, batch_id=bid)
    pairs_t.append(pairs2, batch_id=bid)
    assert pairs_t.read(spark).count() == n_pairs
    assert idx.signatures(spark).count() == n_sigs


def test_max_files_per_trigger_splits_ticks_same_result(
    spark, sf_dir, tmp_path
):
    """Backlog control: many staged files drained one-per-tick give the
    same accumulated pair set as a single big tick (union-of-ticks ≡
    batch, the property that makes the cap safe to tune)."""
    docs = load_table(spark, sf_dir, "documents")
    crawl = str(tmp_path / "crawl")
    for day in range(3):
        _stage_crawl(
            spark, docs.filter(F.col("doc_id") % 3 == day), crawl, day
        )

    stream_dedup_ticks(
        spark, crawl, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    got = _pair_set(accumulated_pairs(spark, str(tmp_path / "pairs")))
    want = _pair_set(minhash_lsh_pairs(docs, 0.5))
    assert got == want and got


def test_post_drain_compaction_preserves_results(spark, sf_dir, tmp_path):
    """Index maintenance: with a low compact threshold, the post-drain
    OPTIMIZE shrinks the signature index's file count while later ticks
    keep producing the same pairs as the batch operator."""
    from etl_tpch_spark.dedup.index import MinHashIndex

    docs = load_table(spark, sf_dir, "documents")
    crawl = str(tmp_path / "crawl")
    for day in range(3):
        _stage_crawl(
            spark, docs.filter(F.col("doc_id") % 3 == day), crawl, day
        )
    stream_dedup_ticks(
        spark, crawl, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
        compact_over_files=1,
    )
    idx = MinHashIndex(str(tmp_path / "idx"))
    assert len(idx.table.snapshot_files()) <= 8  # compacted post-drain
    got = _pair_set(accumulated_pairs(spark, str(tmp_path / "pairs")))
    want = _pair_set(minhash_lsh_pairs(docs, 0.5))
    assert got == want and got
