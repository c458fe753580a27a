"""Bucketed tables: co-located fact⋈fact joins with no shuffle.

The flagship's orders⋈lineitem is the one join the engine cannot
broadcast (both sides are facts, SURVEY.md J2).  At 100 TB that join
shuffles both tables on every query.  Bucketing amortizes the shuffle
into the write: both tables are written pre-hash-partitioned into the
same number of buckets on the join key, so every subsequent join (or
groupBy on the key) reads co-located buckets — ``.explain`` shows a
SortMergeJoin with **no Exchange** on either side.

Spark bucketing lives in the session catalog (``saveAsTable``; a plain
``.save(path)`` silently drops bucket metadata).  The bucket count is a
layout decision: at 100 TB, pick buckets ≈ table_size / 1 GB, and keep
it identical across co-bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int,
    *,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    Sorting within buckets lets the join skip its per-task sort too."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def cobucket_orders_lineitem(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    n_buckets: int = 8,
    prefix: str = "b",
) -> tuple[DataFrame, DataFrame]:
    """Write both fact tables co-bucketed on the order key (handles
    either naming family) and return the catalog-backed DataFrames.
    One shuffle each at write time buys shuffle-free joins forever
    after — the right trade for any fact joined more than once."""
    okey = "o_orderkey"
    lkey = "l_orderkey"
    write_bucketed(orders, f"{prefix}_orders", okey, n_buckets)
    write_bucketed(lineitem, f"{prefix}_lineitem", lkey, n_buckets)
    return spark.table(f"{prefix}_orders"), spark.table(f"{prefix}_lineitem")
