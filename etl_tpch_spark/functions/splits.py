"""Content-hash addressing for splits and sampling — the ONE
definition every consumer shares.

The leakage-safety of the train/validation/test split (and the
append-stability of hash sampling) depends on every code path —
the registered split queries, the corpus tick (pipeline/corpus.py),
the report card — computing the bit-identical hash and thresholds;
a drifted copy silently assigns the same document to different
splits in different pipelines.  Spark and DuckDB twins live side by
side here so they can never diverge independently.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 80/10/10 by 32-bit-hash bucket mod 100
SPLIT_BUCKETS = (80, 90)

SQL_DOC_HASH = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
)

SQL_HASH_SPLIT = f"""CASE WHEN {SQL_DOC_HASH} % 100 < {SPLIT_BUCKETS[0]} THEN 'train'
                    WHEN {SQL_DOC_HASH} % 100 < {SPLIT_BUCKETS[1]} THEN 'validation'
                    ELSE 'test' END"""


def doc_hash(doc_id: Column | None = None) -> Column:
    """32-bit md5 hash of the doc id — the engine's split/sample key
    (cross-engine twin: SQL_DOC_HASH)."""
    c = F.col("doc_id") if doc_id is None else doc_id
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
    ).cast("long")


def hash_split(doc_id: Column | None = None) -> Column:
    """Leakage-safe train/validation/test assignment by hash bucket —
    a pure row-local function: membership never moves under appends
    or repartitioning (cross-engine twin: SQL_HASH_SPLIT)."""
    bucket = doc_hash(doc_id) % 100
    return (
        F.when(bucket < SPLIT_BUCKETS[0], "train")
        .when(bucket < SPLIT_BUCKETS[1], "validation")
        .otherwise("test")
    )
