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

from pyspark.sql import DataFrame, SparkSession


def upsert_table(
    spark: SparkSession,
    processed_dir: str,
    table: str,
    updates: DataFrame,
    *,
    key: str,
    fmt: str = "parquet",
) -> int:
    """Merge ``updates`` into ``<processed>/<table>/`` by ``key``.
    Returns the resulting row count.  Creates the table if absent.
    Refuses streaming-sink-managed dirs (same reason as compaction:
    an external rewrite orphans the sink's exactly-once log)."""
    path = os.path.join(processed_dir, table)
    if not os.path.exists(path):
        updates.write.format(fmt).save(path)
        return updates.count()
    if os.path.exists(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is managed by a streaming sink; upsert via the "
            "stream (or a log-aware format like Delta), not a rewrite"
        )

    target = spark.read.format(fmt).load(path)
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
