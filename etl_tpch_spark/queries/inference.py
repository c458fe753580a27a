"""Batch-inference query registration (pandas-UDF surface, SURVEY §1.4).

This is the one registered query that intentionally runs Python — it
exists to verify the Arrow-batched UDF path end to end against a SQL
oracle (score parity to 6 decimals incl. exp())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.inference import (
    logistic_score,
    predicted_label,
    sql_logistic_score,
)
from ..registry import query


@query(
    "inference_batch_scores",
    oracle=f"""
        SELECT vec_id,
               label,
               round({sql_logistic_score('embedding')}, 6) AS score,
               CAST(round({sql_logistic_score('embedding')}, 6) > 0.5
                    AS INTEGER) AS predicted
        FROM embeddings
    """,
)
def batch_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized model inference over the embeddings table: Arrow
    batches → numpy logistic scorer → scores + thresholded labels.
    Swap the demo scorer for xgb/torch predict for a real model —
    the Spark plumbing (broadcast weights, batch shape) is identical."""
    t = Tables(spark, sf_dir)
    scored = t.embeddings.withColumn(
        "score", F.round(logistic_score(F.col("embedding")), 6)
    )
    return scored.select(
        "vec_id",
        "label",
        "score",
        predicted_label(F.col("score")).alias("predicted"),
    )
