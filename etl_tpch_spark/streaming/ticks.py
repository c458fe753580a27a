"""Shared driver for index-tick streams: staged crawl files drain
through a checkpointed AvailableNow file stream, one exactly-once tick
per micro-batch.

Both daily-crawl index streams (streaming/dedup_index.py minhash
signatures, streaming/span_index.py window hashes) are the same
protocol — file-source checkpoint + content-derived epoch batch ids
(streaming/batchid.py) + post-drain index compaction — differing only
in what a tick does.  Keeping the protocol in ONE place means a fix to
the replay/compaction contract lands everywhere at once (this repo has
already shipped two such hardening sweeps; each had to touch every
copy)."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .batchid import batch_content_id

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def stream_doc_ticks(
    spark: SparkSession,
    crawl_dir: str,
    checkpoint_dir: str,
    tick: Callable[[DataFrame, str], None],
    *,
    schema: T.StructType = DOC_SCHEMA,
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    after_drain: Callable[[], None] | None = None,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines matching ``schema``) and
    call ``tick(batch, batch_id)`` once per micro-batch, with
    ``batch_id = f"{checkpoint_name}-{epoch}-{content_fingerprint}"``
    (fingerprint over ``id_col``) — idempotent against both the
    foreachBatch replay window AND a wiped checkpoint over re-bundled
    files.  ``after_drain`` (e.g. index compaction) runs once the
    drain finishes; requires ``await_termination``."""
    ckpt_name = os.path.basename(os.path.normpath(checkpoint_dir))

    def run(batch: DataFrame, epoch_id: int) -> None:
        bid = f"{ckpt_name}-{epoch_id}-{batch_content_id(batch, id_col)}"
        tick(batch, bid)

    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.json(crawl_dir).select(*[f.name for f in schema.fields])

    q = (
        src.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
        if after_drain is not None:
            after_drain()
    return q
