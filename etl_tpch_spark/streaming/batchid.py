"""Content-derived exactly-once batch ids for foreachBatch sinks.

A purely positional id (checkpoint name + epoch id) has a silent
data-loss mode: if the checkpoint is wiped AFTER new source files were
staged, the restarted stream's epoch 0 bundles old+new rows under the
SAME id the old epoch 0 recorded — the idempotent sink then treats the
genuinely-new rows as a replay and drops them without error.  (Two
streams whose checkpoint dirs share a basename collide the same way.)

Appending a content fingerprint closes both holes: an identical
replayed batch keeps an identical id (no-op, as required), while a
batch whose membership changed gets a NEW id and lands.  The
fingerprint is one tiny aggregation per micro-batch — count + an
order-independent xxhash64 sum over the key column (integer addition
is associative, so the value is stable under any partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_content_id(batch: DataFrame, key_col: str) -> str:
    """Deterministic fingerprint of a micro-batch's membership.
    Hashes reduce mod a prime before summing so the sum stays far
    inside int64 for any realistic batch (ANSI mode makes a raw
    sum(xxhash64) overflow an error, not a wrap)."""
    r = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(key_col), F.lit(1_000_000_007))
        ).alias("h"),
    ).first()
    return f"{r['n']}x{r['h']}"
