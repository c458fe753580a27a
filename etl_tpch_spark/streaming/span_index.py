"""Streaming daily-crawl span dedup: a document stream ticks the
persisted window index (dedup/spans.py SpanIndex) exactly-once per
micro-batch — the span-family twin of streaming/dedup_index.py, both
riding the shared tick protocol in streaming/ticks.py.

Each tick windows ONLY the micro-batch's documents, appends to the
index TxTable, and appends the batch's duplicated spans to a results
TxTable, both keyed by the same content-derived epoch batch id, so the
foreachBatch replay window (crash between sink commit and checkpoint
advance) re-signs nothing and re-emits nothing.

Semantics note (differs from the pair stream): spans are keyed per
document, so a tick reports each new doc's duplicated spans **against
the corpus seen so far** (stored index + its own batch).  A document
duplicated only by LATER arrivals grows spans when those arrive — in
their tick's rows, keyed by their doc_ids (the later copies carry the
spans).  That is the daily-crawl product: "what of today's crawl is
already-seen text"; retro-annotating yesterday's docs is a batch
re-run of text_duplicate_spans over the stored index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..dedup.spans import SpanIndex
from ..pipeline.txlog import TxTable
from .ticks import DOC_SCHEMA, stream_doc_ticks


def stream_span_ticks(
    spark: SparkSession,
    crawl_dir: str,
    index_path: str,
    spans_path: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    compact_over_files: int | None = 64,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines of doc_id/text) through
    span-index ticks, appending each tick's duplicated spans to
    ``spans_path``; AvailableNow trigger = one scheduler run.
    ``compact_over_files`` OPTIMIZEs the window index after the drain
    once its snapshot exceeds that many files (None disables;
    requires ``await_termination``)."""
    idx = SpanIndex(index_path)
    spans_t = TxTable(spans_path)

    def tick(batch: DataFrame, bid: str) -> None:
        spans = idx.tick(batch.sparkSession, batch, batch_id=bid)
        spans_t.append(spans, batch_id=bid)

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


def accumulated_spans(spark: SparkSession, spans_path: str) -> DataFrame:
    """Snapshot of every tick's duplicated spans so far."""
    return TxTable(spans_path).read(spark)
