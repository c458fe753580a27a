"""Streaming daily-crawl inverted-index ticks: a document stream
ingests the persisted SearchIndex (pipeline/search_index.py)
exactly-once per micro-batch — the lexical-retrieval twin of
streaming/{dedup_index,span_index,lm_scores,hll_index,ivf_index}.py,
all riding the shared tick protocol in streaming/ticks.py.

Each tick tokenizes ONLY the micro-batch's documents and appends
their postings + doclens under the batch's content-derived epoch id
(suffixed per table inside SearchIndex.ingest), so the foreachBatch
replay window re-tokenizes nothing and re-appends nothing, and a
crash between the two table commits completes on replay.  After the
drain, the postings table is re-clustered by term once it accretes
past ``compact_over_files`` — the maintenance pass that keeps a
single-term probe at one-file-of-N cost as days accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.search_index import SearchIndex
from .ticks import DOC_SCHEMA, stream_doc_ticks


def stream_search_ticks(
    spark: SparkSession,
    crawl_dir: str,
    index_path: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    compact_over_files: int | None = 64,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines of doc_id/text) through
    inverted-index ingest ticks; AvailableNow trigger = one scheduler
    run.  ``compact_over_files`` re-clusters postings by term after
    the drain once the snapshot exceeds that many files (None
    disables; requires ``await_termination``)."""
    idx = SearchIndex(index_path)

    def tick(batch: DataFrame, bid: str) -> None:
        idx.ingest(batch, batch_id=bid)

    def maybe_optimize() -> None:
        if (
            compact_over_files
            and len(idx.postings.snapshot_files()) > compact_over_files
        ):
            idx.optimize(spark)

    return stream_doc_ticks(
        spark,
        crawl_dir,
        checkpoint_dir,
        tick,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        await_termination=await_termination,
        after_drain=maybe_optimize,
    )
