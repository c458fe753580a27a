"""Streaming daily-crawl dedup: a document stream ticks the persisted
MinHash signature index exactly-once per micro-batch.

The batch-side story (dedup/index.py) made one tick O(new): sign only
the new batch, append to the signature TxTable, band-join against
storage.  This module is the OPERATING mode of that story — the crawl
lands as files, a checkpointed Structured Streaming source discovers
them, and ``foreachBatch`` runs one index tick per micro-batch:

- **exactly-once, twice over**: the file source's checkpoint prevents
  re-reading a crawl file, and the index append is keyed
  ``batch_id=f"{checkpoint_name}-{epoch_id}-{content-fingerprint}"``
  (streaming/batchid.py — the fingerprint keeps a checkpoint-wiped
  re-bundle of old+NEW files from no-op'ing the new docs) — a replayed epoch
  (crash between sink commit and checkpoint advance, the classic
  foreachBatch replay window) re-signs nothing and re-emits the same
  pairs (TxTable batch-id no-op, the same contract as
  pipeline/matview.py's epoch commits);
- **bounded per-tick work**: ``maxFilesPerTrigger`` caps a backlog
  spike at N crawl files per tick, so one tick's signing cost stays
  O(files-per-trigger), independent of how far behind the stream is;
- **pairs as a stream product**: each tick's near-dup pairs append to
  a results TxTable with the same epoch batch_id — downstream
  (canonical selection, cluster stats) reads a consistent snapshot.

At 100 TB this is the shape that replaces the nightly full-corpus
dedup job: the index grows by appends, OPTIMIZE on the maintenance
cadence (index.compact), and no tick ever touches corpus text again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..dedup.index import MinHashIndex
from ..pipeline.txlog import TxTable
from .ticks import DOC_SCHEMA, stream_doc_ticks

__all__ = ["DOC_SCHEMA", "stream_dedup_ticks", "accumulated_pairs"]


def stream_dedup_ticks(
    spark: SparkSession,
    crawl_dir: str,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    *,
    threshold: float = 0.5,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    compact_over_files: int | None = 64,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines of doc_id/text) through
    index ticks, appending each tick's near-dup pairs to
    ``pairs_path``; AvailableNow trigger = one scheduler run.

    ``compact_over_files``: after the drain, OPTIMIZE the signature
    index when its snapshot exceeds this many files (daily appends
    accrete small files; band-join scan cost tracks file count).  The
    compaction is the txlog op-aware one — concurrent tick appends
    from another scheduler instance are carried, never dropped.  None
    disables.  Requires ``await_termination``."""
    idx = MinHashIndex(index_path)
    pairs_t = TxTable(pairs_path)

    def tick(batch: DataFrame, bid: str) -> None:
        pairs = idx.tick(
            batch.sparkSession, batch, threshold, batch_id=bid
        )
        pairs_t.append(pairs, batch_id=bid)

    def maybe_compact() -> None:
        if (
            compact_over_files
            and len(idx.table.snapshot_files()) > compact_over_files
        ):
            idx.compact(spark)

    return stream_doc_ticks(
        spark,
        crawl_dir,
        checkpoint_dir,
        tick,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        await_termination=await_termination,
        after_drain=maybe_compact,
    )


def accumulated_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """Snapshot of every tick's near-dup pairs so far."""
    return TxTable(pairs_path).read(spark)
