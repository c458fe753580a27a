"""Join operators beyond Spark's built-ins.

The reference has only equi inner joins (pipeline/reduce.py:63-64,
data.py:74-93 — SURVEY.md §2.3).  Spark natively covers inner/outer/
semi/anti/cross plus arbitrary non-equi conditions; the two shapes it
lacks a first-class operator for are **as-of** and **interval/range**
joins — both standard in time-series engines and needed by event
pipelines.  Implemented here as compositions of built-in DataFrame ops
(preference order per the build rules: compose > pandas UDF > RDD).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for every left row, attach the columns of the
    *latest* right row with ``right[right_ts] <= left[left_ts]`` and the
    same ``on`` key (NULLs if none) — `pd.merge_asof` / DuckDB `ASOF
    JOIN` semantics.

    Implementation is the union+window trick — the scalable form:
    union both sides tagged, sort within each key partition by
    (ts, side) so right rows precede left rows at equal timestamps, and
    carry right values forward with ``last(..., ignorenulls=True)``.
    One shuffle on the key, no range explosion, no per-group Python —
    survives arbitrarily many rows per key at 100 TB (contrast a naive
    non-equi join, which is O(n·m) per key).

    Right rows must be unique per (on, right_ts) — pre-aggregate
    duplicates or results are ambiguous (we keep the last in sort
    order, deterministic only with unique keys).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in lcols],
    ).withColumn(f"{prefix}{right_ts}", F.col("_ts"))
    tagged_l = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{prefix}{c}") for c in right_value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    ).withColumn(f"{prefix}{right_ts}", F.lit(None).cast(dict(right.dtypes)[right_ts]))

    u = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [f"{prefix}{c}" for c in right_value_cols] + [f"{prefix}{right_ts}"]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols], *carried
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + range-predicate join.  Expressed as a single join with
    a composite condition: Catalyst extracts the equi part for the hash/
    sort-merge strategy and applies the range predicate as a post-join
    filter — the right plan when the equi key is selective.  For pure
    range joins (no equi key) bucketize the range key first and join on
    the bucket (see queries/relational_ops.py range-join query)."""
    return left.join(right, (left[on] == right[on]) & condition, how)
