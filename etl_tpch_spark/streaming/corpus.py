"""Streaming LLM-corpus curation: crawl files drain through a
checkpointed stream, one ``corpus_cycle`` tick per micro-batch.

This is the operating mode of pipeline/corpus.py — the third member
of the streaming-index family (dedup ticks: streaming/dedup_index.py;
HLL ticks: streaming/hll_index.py), but driving the WHOLE curation
composition: per epoch, the new crawl docs are deduped against the
persisted signature index, quality-gated, split-assigned and appended
to the corpus TxTable — every mutation keyed by the epoch batch id,
so a replayed epoch (the foreachBatch replay window) re-signs nothing
and re-appends nothing.

At 100 TB/day this is the production shape: the crawler drops files,
the stream discovers them (``maxFilesPerTrigger`` bounds a backlog
spike), each tick costs O(new batch) against the stored index, and
the curated corpus is always a consistent, time-travelable snapshot.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.corpus import corpus_cycle
from .ticks import stream_doc_ticks

CRAWL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def stream_corpus_ticks(
    spark: SparkSession,
    crawl_dir: str,
    root_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = CRAWL_SCHEMA,
    threshold: float = 0.5,
    quality_floor: float = 0.2,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    summaries: list | None = None,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines) through corpus ticks;
    AvailableNow trigger = one scheduler run.  ``summaries`` (if a
    list is passed) collects each tick's stage→outcome dict."""
    def tick(batch: DataFrame, bid: str) -> None:
        out = corpus_cycle(
            batch.sparkSession,
            batch,
            root_dir,
            batch_id=bid,
            threshold=threshold,
            quality_floor=quality_floor,
        )
        if summaries is not None:
            summaries.append(out)

    return stream_doc_ticks(
        spark,
        crawl_dir,
        checkpoint_dir,
        tick,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        await_termination=await_termination,
    )
