"""TxTable.history(): the DESCRIBE HISTORY view derived from the
commit log — op sequence, file deltas, row counts and batch ids per
version, with vacuum truncating history to the retained suffix."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_history_tracks_op_sequence_and_deltas(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10), batch_id="b0")
    t.append(_df(spark, 10, 20), batch_id="b1")
    keys = spark.createDataFrame([(0,), (1,)], "k LONG")
    t.delete(spark, keys, "k")
    t.compact(spark, target_files=1)

    h = {r.version: r for r in t.history(spark).collect()}
    assert [h[v].op for v in sorted(h)] == [
        "append",
        "append",
        "delete",
        "compact",
    ]
    assert h[1].batch_id == "b0" and h[2].batch_id == "b1"
    # second append carries the first's files and adds its own
    assert h[2].files_added >= 1 and h[2].files_removed == 0
    # the delete rewrote at least one file
    assert h[3].files_removed >= 1
    # compact collapsed the snapshot to one file
    assert h[4].n_files == 1
    # row counts from manifest stats: 20 ingested, 2 deleted
    assert h[2].n_rows == 20
    assert h[3].n_rows == 18 == h[4].n_rows
    # history is driver-side; equality with the real table state
    assert t.read(spark).count() == 18


def test_history_marks_vacuumed_entries(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    t.overwrite(_df(spark, 0, 3))
    t.vacuum(keep_versions=1)
    h = {r.version: r for r in t.history(spark).collect()}
    # vacuum truncated the log: history covers the retained suffix
    # (Delta's retention-truncated DESCRIBE HISTORY)
    assert set(h) == {3}
    assert h[3].op == "vacuum"
