"""Streaming classifier-scoring: a document stream scores each
micro-batch against the persisted quality classifier
(pipeline/quality_clf.py QualityClfIndex) exactly-once per tick
(VERDICT r8 #3 — the last index family without a streaming twin).

This is the OPERATING mode of the trained quality gate: weights were
trained once into a TxTable artifact (K gradient rounds, never
re-run here); crawl files land in a staging dir, a checkpointed
stream discovers them, and each micro-batch is scored against STORED
weights — one feature projection over the new docs
(QualityClfIndex.score_batch: features hashed at the STORED bucket
count, the codegen fold at the demo B, the mapInArrow kernel past the
measured crossover — SCALING.md "Classifier bucket-count scale axis").  Zero training text touched,
zero scored corpus rescanned: the O(new) daily-crawl tick.

Protocol = streaming/ticks.py (shared with the minhash / span / LM /
HLL / corpus streams): file-source checkpoint + content-derived epoch
batch ids, so a replayed epoch — or a wiped checkpoint over re-bundled
files — appends nothing twice and loses nothing.  Scored rows append
to a results TxTable keyed by the tick's batch id; downstream (the
keep/drop gate, mixture planning, the report card) reads a consistent
snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.quality_clf import QualityClfIndex
from ..pipeline.txlog import TxTable
from .ticks import stream_doc_ticks

__all__ = [
    "CLF_DOC_SCHEMA",
    "stream_clf_score_ticks",
    "accumulated_clf_scores",
]

CLF_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def stream_clf_score_ticks(
    spark: SparkSession,
    crawl_dir: str,
    clf_path: str,
    scores_path: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType = CLF_DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Drain staged crawl files (JSON-lines of doc_id/text/lang/source)
    and append each micro-batch's classifier scores (doc_id, score_q,
    prob_micro) to ``scores_path`` exactly-once.  The classifier at
    ``clf_path`` must already be trained (QualityClfIndex.retrain) —
    ticks only read it."""
    idx = QualityClfIndex(clf_path)
    scores_t = TxTable(scores_path)

    def tick(batch: DataFrame, bid: str) -> None:
        scores_t.append(
            idx.score_batch(batch.sparkSession, batch), batch_id=bid
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


def accumulated_clf_scores(
    spark: SparkSession, scores_path: str
) -> DataFrame:
    """Snapshot read of every tick's scored rows."""
    return TxTable(scores_path).read(spark)
