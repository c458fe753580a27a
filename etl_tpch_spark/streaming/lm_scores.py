"""Streaming crawl quality-scoring: a document stream scores each
micro-batch against the persisted bigram LM (pipeline/lm_index.py)
exactly-once per tick.

This is the OPERATING mode of the CCNet story: the reference LM was
trained once into a TxTable of counts; crawl files land in a staging
dir, a checkpointed stream discovers them, and each micro-batch is
scored against STORED conditionals — one pass over the new docs, zero
reference retokenization (the batch-side contract pinned in
tests/test_lm_index.py carries over verbatim because the tick calls
the same LmIndex.score).

Protocol = streaming/ticks.py (shared with the minhash / span / HLL /
corpus streams): file-source checkpoint + content-derived epoch batch
ids, so a replayed epoch — or a wiped checkpoint over re-bundled
files — appends nothing twice and loses nothing.  Scored rows append
to a results TxTable keyed by the tick's batch id; downstream (the
keep/drop gate, mixture planning, the report card) reads a consistent
snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.lm_index import LmIndex
from ..pipeline.txlog import TxTable
from .ticks import stream_doc_ticks

__all__ = ["SCORED_DOC_SCHEMA", "stream_lm_score_ticks", "accumulated_scores"]

SCORED_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def stream_lm_score_ticks(
    spark: SparkSession,
    crawl_dir: str,
    lm_path: str,
    scores_path: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = SCORED_DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines of doc_id/text/lang/source)
    and append each micro-batch's LM scores to ``scores_path``
    exactly-once.  The LM at ``lm_path`` must already be ingested
    (LmIndex.ingest) — ticks only read it."""
    idx = LmIndex(lm_path)
    scores_t = TxTable(scores_path)

    def tick(batch: DataFrame, bid: str) -> None:
        scores_t.append(
            idx.score(batch.sparkSession, batch), batch_id=bid
        )

    return stream_doc_ticks(
        spark,
        crawl_dir,
        checkpoint_dir,
        tick,
        schema=schema,
        max_files_per_trigger=max_files_per_trigger,
        await_termination=await_termination,
    )


def accumulated_scores(spark: SparkSession, scores_path: str) -> DataFrame:
    """Snapshot read of every tick's scored rows."""
    return TxTable(scores_path).read(spark)
