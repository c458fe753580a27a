"""Delta-style additive schema evolution (txlog append
merge_schema=True): evolved snapshots union file schemas, the flag
rides carry-ops and clears on whole-table rewrites, type drift stays
rejected, and pruned/delete subset reads stay schema-stable."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


def _narrow(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, val string"
    )


def _wide(spark):
    return spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "k long, val string, score long"
    )


def test_plain_append_still_rejects_divergent_schema(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_wide(spark))


def test_merge_schema_append_unions_and_nulls(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    t.append(_wide(spark), merge_schema=True)
    got = t.read(spark)
    assert set(got.columns) == {"k", "val", "score"}
    rows = {r.k: r.score for r in got.collect()}
    assert rows == {1: None, 2: None, 3: 30, 4: 40}
    # time travel: the pre-evolution snapshot keeps its narrow schema
    assert set(t.read(spark, version=1).columns) == {"k", "val"}


def test_evolution_rejects_type_drift(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    bad = spark.createDataFrame([(9, 1.5)], "k long, val double")
    with pytest.raises(ValueError, match="cannot change column"):
        t.append(bad, merge_schema=True)


def test_evolution_allows_missing_columns_as_null(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_wide(spark))
    t.append(_narrow(spark), merge_schema=True)  # omits score
    rows = {r.k: r.score for r in t.read(spark).collect()}
    assert rows == {1: None, 2: None, 3: 30, 4: 40}


def test_flag_rides_plain_appends_and_delete(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    t.append(_wide(spark), merge_schema=True)
    # a later PLAIN append of the evolved schema keeps the flag (old
    # narrow files are still in the snapshot)
    t.append(
        spark.createDataFrame(
            [(5, "e", 50)], "k long, val string, score long"
        )
    )
    assert set(t.read(spark).columns) == {"k", "val", "score"}
    # delete carries untouched narrow files → still unions
    keys = spark.createDataFrame([(3,)], "k long")
    assert t.delete(spark, keys, "k") is not None
    got = {r.k: r.score for r in t.read(spark).collect()}
    assert got == {1: None, 2: None, 4: 40, 5: 50}


def test_compact_materializes_uniform_schema_and_clears_flag(
    spark, tmp_path
):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    t.append(_wide(spark), merge_schema=True)
    t.compact(spark, target_files=1)
    v = t.latest_version()
    assert not t.commit_entry(v).get("merged_schema")
    got = t.read(spark)
    assert set(got.columns) == {"k", "val", "score"}
    assert {r.k: r.score for r in got.collect()} == {
        1: None,
        2: None,
        3: 30,
        4: 40,
    }
    # post-compact plain appends enforce the WIDE schema
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_narrow(spark))


def test_evolved_read_where_is_schema_stable(spark, tmp_path):
    """Pruned reads expose evolved columns even when every surviving
    file predates the evolution — predicates on the new column
    select nothing instead of crashing."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    t.append(_wide(spark), merge_schema=True)
    got = t.read_where(spark, [("k", "<=", 2)])
    assert set(got.columns) == {"k", "val", "score"}
    assert {r.k for r in got.collect()} == {1, 2}
    hits = t.read_where(spark, [("score", ">=", 40)])
    assert {r.k for r in hits.collect()} == {4}


def test_evolving_append_replay_is_noop(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))
    v1 = t.append(_wide(spark), merge_schema=True, batch_id="evo-1")
    v2 = t.append(_wide(spark), merge_schema=True, batch_id="evo-1")
    assert v1 == v2
    assert t.read(spark).count() == 4


# --------------------------------------------------------------- RESTORE


def test_restore_rewinds_to_old_snapshot(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))  # v1
    t.append(
        spark.createDataFrame([(9, "z")], "k long, val string")
    )  # v2
    keys = spark.createDataFrame([(1,)], "k long")
    t.delete(spark, keys, "k")  # v3 — the "mistake"
    assert {r.k for r in t.read(spark).collect()} == {2, 9}

    v = t.restore(1)
    assert v == 4  # restore is a NEW version, not history rewriting
    assert {r.k for r in t.read(spark).collect()} == {1, 2}
    # the skipped-over states stay time-travelable
    assert {r.k for r in t.read(spark, version=3).collect()} == {2, 9}


def test_restore_preserves_evolution_flag_and_batch_ids(
    spark, tmp_path
):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark), batch_id="b1")  # v1
    t.append(_wide(spark), merge_schema=True)  # v2 (evolved)
    t.append(
        spark.createDataFrame(
            [(7, "g", 70)], "k long, val string, score long"
        )
    )  # v3
    t.restore(2)
    got = t.read(spark)
    assert set(got.columns) == {"k", "val", "score"}  # flag carried
    assert {r.k for r in got.collect()} == {1, 2, 3, 4}
    # exactly-once survives the rewind: the restored state predates
    # nothing — applied batch ids stay applied
    v = t.latest_version()
    assert t.append(_narrow(spark), batch_id="b1") == v


def test_restore_refuses_vacuumed_version(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_narrow(spark))  # v1
    t.overwrite(spark.createDataFrame([(5, "e")], "k long, val string"))
    t.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="restore|available"):
        t.restore(1)
