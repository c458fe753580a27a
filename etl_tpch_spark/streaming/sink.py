"""Streaming merge sink: CDC-style keyed upsert via ``foreachBatch``.

The reference's pipeline is append-only (preprocess.py:42-44); a change
feed (orders whose status/price changes, late corrections) can only be
expressed by re-appending and letting readers pick "latest" at query
time.  The lakehouse answer is a streaming MERGE: each micro-batch of
updates is collapsed to its latest row per key and merged into the
target table.

``foreachBatch`` is Spark's escape hatch for sinks without native
streaming support: the function receives each micro-batch as a *batch*
DataFrame, so the whole batch API (joins, the copy-on-write upsert)
applies.  Exactly-once here comes from idempotence, not the commit log:
replaying a micro-batch re-merges identical rows into an identical
final state, so a crash between checkpoint commits cannot corrupt the
table — the standard contract for foreachBatch sinks.

At 100 TB: with delta-spark jars the merge body becomes
``DeltaTable.merge`` (file-level rewrite); the parquet copy-on-write
fallback is right for small dimension tables receiving correction
feeds, not for fact-table firehoses (append those, dedup at read)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.upsert import upsert_table


def stream_upsert_sink(
    updates_stream: DataFrame,
    processed_dir: str,
    table: str,
    checkpoint_dir: str,
    *,
    key: str,
    order_col: str,
    fmt: str = "parquet",
    await_termination: bool = True,
) -> StreamingQuery:
    """Merge a stream of keyed updates into ``<processed>/<table>/``:
    per micro-batch, a latest-wins MERGE ordered by ``order_col``
    (pipeline/upsert.py) — replay-safe, so checkpoint replays cannot
    regress a key to an older version.  Drains the backlog and stops
    (AvailableNow); swap the trigger for an always-on CDC applier."""
    spark = updates_stream.sparkSession

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_table(
            spark,
            processed_dir,
            table,
            batch_df,
            key=key,
            order_col=order_col,
            fmt=fmt,
        )

    q = (
        updates_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_merge_txtable(
    updates_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    key: str,
    order_col: str,
    max_conflict_retries: int = 5,
    await_termination: bool = True,
) -> StreamingQuery:
    """The transaction-log variant of the CDC applier: each
    micro-batch collapses to its latest row per key (``order_col``)
    and MERGEs into a TxTable (pipeline/txlog.py) keyed by the epoch
    batch id — TRUE exactly-once (a replayed epoch mutates nothing,
    not merely "re-merges to an identical result"), with every
    pre-merge version time-travelable.  A merge abort (rival writer
    on the same table) retries against the new state — the per-key
    latest-wins result is order-insensitive across appliers, so the
    retry is always safe."""
    import os

    from ..pipeline.txlog import TxTable
    from ..pipeline.upsert import latest_per_key

    t = TxTable(table_path)
    ckpt_name = os.path.basename(os.path.normpath(checkpoint_dir))

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        latest = latest_per_key(batch_df, key, order_col)
        bid = f"{ckpt_name}-{epoch_id}"
        for _ in range(max_conflict_retries):
            if t.merge(batch_df.sparkSession, latest, key,
                       batch_id=bid) is not None:
                return
        raise RuntimeError(
            f"merge conflict persisted {max_conflict_retries} retries"
        )

    q = (
        updates_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_apply_cdc(
    updates_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    key: str,
    order_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    max_conflict_retries: int = 5,
    await_termination: bool = True,
) -> StreamingQuery:
    """The FULL change-data-capture applier (Debezium shape): each row
    carries an operation tag — insert/update (anything but
    ``delete_op``) or delete — and each micro-batch nets to one final
    action per key before touching the table:

    1. collapse to the latest row per ``key`` by ``order_col`` — an
       insert followed by a delete inside one batch nets to a delete,
       a delete followed by a re-insert nets to an upsert (the tag on
       the LATEST row wins, exactly Delta's
       ``whenMatchedDelete(condition)`` netting);
    2. upsert keys MERGE, delete keys DELETE (pipeline/txlog.py) —
       the key sets are disjoint by construction, so the two commits
       compose in either order;
    3. both commits are keyed by the epoch batch id (suffixes ``-u`` /
       ``-d``), so a crash in the foreachBatch replay window — even
       BETWEEN the two commits — replays to a no-op for whichever
       half already landed.

    Rival-writer aborts (snapshot CAS in merge/delete) retry against
    the new state; per-key netting makes the retry order-insensitive
    across appliers."""
    import os

    from pyspark.sql import functions as F

    from ..pipeline.txlog import TxTable
    from ..pipeline.upsert import latest_per_key

    t = TxTable(table_path)
    ckpt_name = os.path.basename(os.path.normpath(checkpoint_dir))

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = latest_per_key(batch_df, key, order_col).cache()
        try:
            upserts = latest.filter(
                F.col(op_col) != delete_op
            ).drop(op_col)
            deletes = latest.filter(
                F.col(op_col) == delete_op
            ).select(key)
            bid = f"{ckpt_name}-{epoch_id}"
            if upserts.take(1):
                for _ in range(max_conflict_retries):
                    if t.merge(
                        spark, upserts, key, batch_id=f"{bid}-u"
                    ) is not None:
                        break
                else:
                    raise RuntimeError("merge conflict persisted")
            if deletes.take(1):
                for _ in range(max_conflict_retries):
                    if t.delete(
                        spark, deletes, key, batch_id=f"{bid}-d"
                    ) is not None:
                        break
                else:
                    raise RuntimeError("delete conflict persisted")
        finally:
            latest.unpersist()

    q = (
        updates_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
