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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.corpus import corpus_cycle
from .batchid import batch_content_id

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
    ckpt_name = os.path.basename(os.path.normpath(checkpoint_dir))

    def tick(batch: DataFrame, epoch_id: int) -> None:
        # epoch id for ordering + content fingerprint for identity: a
        # wiped checkpoint whose epoch 0 re-bundles old AND newly
        # staged files must not no-op the new docs (streaming/batchid.py)
        bid = f"{ckpt_name}-{epoch_id}-{batch_content_id(batch, 'doc_id')}"
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

    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.json(crawl_dir).select(*[f.name for f in schema])

    q = (
        src.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
