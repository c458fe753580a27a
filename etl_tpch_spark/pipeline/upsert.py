"""Keyed upsert (MERGE) into a parquet table directory.

The reference only ever *appends* (preprocess.py:42-44); correcting a
row means waiting for compaction-less duplicates to be outrun by new
data.  A lakehouse needs MERGE: new rows insert, matching keys replace.
With delta-spark jars this is ``DeltaTable.merge``; the parquet
fallback here is the classic copy-on-write:

    updated = target ⟕(anti) updates  ∪  updates

i.e. keep every target row whose key is NOT updated (left-anti join —
one shuffle on the key) plus all update rows, then atomically swap the
directory (same write-then-rename as compact.py — readers see old or
new, never a mix).

Cost model at 100 TB: copy-on-write rewrites the whole table per merge
— right for low-frequency bulk corrections.  For frequent small merges,
partition the table (ingest ``partition_by``) and rewrite only affected
partitions (``replaceWhere`` semantics), or use Delta which does that
file-level.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """One row per key: highest ``order_col`` wins.  ``order_col`` must
    be a total order per key (version / source timestamp), otherwise
    ties resolve arbitrarily."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_table(
    spark: SparkSession,
    processed_dir: str,
    table: str,
    updates: DataFrame,
    *,
    key: str,
    order_col: str | None = None,
    fmt: str = "parquet",
) -> int:
    """Merge ``updates`` into ``<processed>/<table>/`` by ``key``.
    Returns the resulting row count.  Creates the table if absent.
    Refuses streaming-sink-managed dirs (same reason as compaction:
    an external rewrite orphans the sink's exactly-once log).

    Without ``order_col``: unconditional replace (update rows win) —
    the plain MERGE.  With ``order_col``: latest-wins merge across
    target ∪ updates — *replay-safe*: re-applying an old update batch
    after newer versions landed is a no-op, which is what makes the
    streaming foreachBatch sink (streaming/sink.py) exactly-once by
    idempotence."""
    path = os.path.join(processed_dir, table)
    if not os.path.exists(path):
        first = (
            latest_per_key(updates, key, order_col) if order_col else updates
        )
        first.write.format(fmt).save(path)
        return spark.read.format(fmt).load(path).count()
    if os.path.exists(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is managed by a streaming sink; upsert via the "
            "stream (or a log-aware format like Delta), not a rewrite"
        )

    target = spark.read.format(fmt).load(path)
    if order_col:
        merged = latest_per_key(
            target.unionByName(updates), key, order_col
        )
    else:
        merged = target.join(
            updates.select(key), key, "left_anti"
        ).unionByName(updates)

    tmp = f"{path}.upsert-{uuid.uuid4().hex[:8]}"
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    merged.write.format(fmt).save(tmp)
    n = spark.read.format(fmt).load(tmp).count()
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n


def upsert_partitioned(
    spark: SparkSession,
    processed_dir: str,
    table: str,
    updates: DataFrame,
    *,
    key: str,
    partition_col: str,
    order_col: str | None = None,
    fmt: str = "parquet",
) -> list:
    """Partition-scoped MERGE into a hive-partitioned table: only the
    partitions present in ``updates`` are rewritten (``replaceWhere``
    semantics) — the 100 TB answer to copy-on-write's full rewrite.

    Merge cost becomes O(affected partitions), not O(table): a daily
    correction feed touching 3 of 3,650 day-partitions rewrites 0.1%
    of the data.  Caller contract: an update must carry the SAME
    partition value as the target row it replaces — a key moving
    across partitions needs delete+insert (partition-local merges
    cannot see the other partition and would duplicate the key).
    Returns the list of rewritten partition values.

    Each affected partition is merged then swapped atomically
    (write-then-rename, same discipline as compact.py) — readers see
    the old or new partition, never a mix; unaffected partitions are
    untouched bytes."""
    path = os.path.join(processed_dir, table)
    affected = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    if not os.path.exists(path):
        w = (
            latest_per_key(updates, key, order_col) if order_col else updates
        ).write.format(fmt).partitionBy(partition_col)
        w.save(path)
        return sorted(affected)

    for pv in affected:
        pdir = os.path.join(path, f"{partition_col}={pv}")
        up = updates.filter(F.col(partition_col) == pv).drop(partition_col)
        if os.path.exists(pdir):
            target = spark.read.format(fmt).load(pdir)
            if order_col:
                merged = latest_per_key(
                    target.unionByName(up), key, order_col
                )
            else:
                merged = target.join(
                    up.select(key), key, "left_anti"
                ).unionByName(up)
        else:
            merged = latest_per_key(up, key, order_col) if order_col else up
        # dot-prefixed siblings: hidden from Spark's file listing, so a
        # concurrent table read never sees a half-written partition dir
        tag = uuid.uuid4().hex[:8]
        tmp = os.path.join(path, f".upsert-{partition_col}-{pv}-{tag}")
        old = os.path.join(path, f".old-{partition_col}-{pv}-{tag}")
        merged.write.format(fmt).save(tmp)
        if os.path.exists(pdir):
            os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old, ignore_errors=True)
    return sorted(affected)
