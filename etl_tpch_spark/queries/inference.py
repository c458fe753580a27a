"""Batch-inference query registration (pandas-UDF surface, SURVEY §1.4).

This is the one registered query that intentionally runs Python — it
exists to verify the Arrow-batched UDF path end to end against a SQL
oracle (score parity to 6 decimals incl. exp())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.udaf import (
    count_agg,
    geometric_mean,
    root_mean_square,
    sql_geometric_mean,
    sql_root_mean_square,
)
from ..functions.gbtree import (
    GbtreeModel,
    demo_model,
    gbtree_score,
    sql_gbtree_score,
)
from ..functions.inference import (
    logistic_score,
    predicted_label,
    sql_logistic_score,
)
from ..registry import query

# parsed back from its own public-schema JSON so the registered query
# exercises the full load path, not just in-memory arrays
_GBTREE = GbtreeModel.from_json(demo_model().to_json())


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


@query(
    "inference_gbtree_scores",
    oracle=f"""
        SELECT p_partkey,
               round({sql_gbtree_score(
                   _GBTREE, ["p_retailprice", "CAST(p_size AS DOUBLE)"]
               )}, 6) AS score,
               CAST(round({sql_gbtree_score(
                   _GBTREE, ["p_retailprice", "CAST(p_size AS DOUBLE)"]
               )}, 6) > 0.5 AS INTEGER) AS predicted
        FROM part
    """,
)
def gbtree_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real tree-model batch inference without the xgboost package
    (round-4 "missing #2"): a gbtree ensemble in XGBoost's public JSON
    schema is parsed and scored by functions/gbtree.py's vectorized
    numpy traversal inside an Arrow-batched pandas UDF, and the SAME
    parsed trees compile to the nested-CASE SQL oracle — so the whole
    load→traverse→transform path is hash-checked, not just plumbed.
    Reference parity: model.json's gbtree over two numeric features
    (reference model.json:1); an installed xgboost scores the identical
    file via xgboost_scorer_udf (functions/inference.py)."""
    t = Tables(spark, sf_dir)
    scored = t.part.withColumn(
        "score",
        F.round(
            gbtree_score(
                _GBTREE,
                F.col("p_retailprice"),
                F.col("p_size").cast("double"),
            ),
            6,
        ),
    )
    return scored.select(
        "p_partkey",
        "score",
        predicted_label(F.col("score")).alias("predicted"),
    )


@query(
    "udaf_grouped_price_stats",
    oracle=f"""
        SELECT l_returnflag,
               round({sql_geometric_mean('l_extendedprice')}, 4)
                 AS geomean_price,
               round({sql_root_mean_square('l_discount')}, 6) AS rms_discount,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def udaf_grouped_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas-UDAF surface (SURVEY.md §2.10): custom
    reductions inside groupBy().agg() — geometric-mean price + RMS
    discount per return flag, hash-verified against the closed-form SQL
    rewrite.  3 groups × ~600k rows at sf0.1: small group count is fine
    for a demo, but note GROUPED_AGG shuffles raw values (no partial
    agg) — see functions/udaf.py for when to prefer built-ins."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.round(geometric_mean(F.col("l_extendedprice")), 4).alias(
                "geomean_price"
            ),
            F.round(root_mean_square(F.col("l_discount")), 6).alias(
                "rms_discount"
            ),
            count_agg(F.col("l_extendedprice")).alias("n"),
        )
    )


@query(
    "curation_model_filter",
    oracle=f"""
        WITH scored AS (
            SELECT d.lang,
                   round({sql_logistic_score('e.embedding')}, 6) AS score
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE score > 0.5) AS BIGINT)
                 AS n_kept,
               CAST(sum(CAST(floor(score * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_score_micro
        FROM scored GROUP BY lang
    """,
)
def curation_model_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus filtering — the quality-classifier gate every
    modern pretraining pipeline runs (fasttext/logreg doc scorers):
    join the corpus to its embedding, score each document with the
    Arrow-batched model UDF, keep score > 0.5, report per-language
    survival.  Composition check: broadcast-join + pandas UDF + agg in
    ONE plan, all hash-verified (swap in xgboost_scorer_udf for a real
    booster — functions/inference.py).  The score total is summed in
    exact integer micro-units (floor(score·1e6+0.5), score already
    rounded to 6dp) — an IEEE double sum would be reduction-order
    dependent and flake the hash at scale.  At 100 TB the join is
    co-partitioned storage (doc and embedding shards share the
    id-hash layout, pipeline/export.py), not a shuffle."""
    t = Tables(spark, sf_dir)
    scored = (
        t.documents.select("doc_id", "lang")
        .join(
            t.embeddings.select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
        )
        .withColumn("score", F.round(logistic_score(F.col("embedding")), 6))
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("score") > 0.5).cast("long")).alias("n_kept"),
        F.sum(
            F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long")
        ).alias("sum_score_micro"),
    )
