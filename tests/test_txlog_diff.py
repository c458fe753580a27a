"""TxTable.diff — change data feed derived from the commit log
(Delta's table_changes shape: inserts/deletes between two versions,
updates as delete+insert pairs), file-scoped so carried files are
never read."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _changes(df):
    return {
        (r["k"], r["v"], r["_change_type"]) for r in df.collect()
    }


def test_append_diffs_as_inserts(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a"), (2, "b")]))
    v2 = t.append(_kv(spark, [(3, "c")]))
    assert _changes(t.diff(spark, v1, v2)) == {(3, "c", "insert")}


def test_delete_diffs_as_deletes(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v2 = t.delete(
        spark, spark.createDataFrame([(2,)], "k long"), "k"
    )
    assert _changes(t.diff(spark, v1, v2)) == {(2, "b", "delete")}


def test_merge_diffs_as_delete_insert_pair(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a"), (2, "b")]))
    v2 = t.merge(spark, _kv(spark, [(2, "B!"), (3, "c")]), "k")
    assert _changes(t.diff(spark, v1, v2)) == {
        (2, "b", "delete"),
        (2, "B!", "insert"),
        (3, "c", "insert"),
    }


def test_duplicate_multiplicity_is_honest(spark, tmp_path):
    """exceptAll semantics: a row held twice that drops to once diffs
    as exactly ONE delete."""
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a"), (1, "a"), (2, "b")]))
    v2 = t.overwrite(_kv(spark, [(1, "a"), (2, "b")]))
    assert _changes(t.diff(spark, v1, v2)) == {(1, "a", "delete")}


def test_carried_files_are_not_read(spark, tmp_path):
    """File scoping: after an append, the diff plan scans ONLY the
    appended files — the carried base files cancel by construction and
    never enter the plan."""
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(i, "x") for i in range(100)]))
    base_files = set(t.snapshot_files(v1))
    v2 = t.append(_kv(spark, [(1000, "y")]))
    new_files = set(t.snapshot_files(v2)) - base_files
    read = {
        f.rsplit("/", 1)[-1]
        for f in t.diff(spark, v1, v2).inputFiles()
    }
    assert read == new_files
    assert not (read & base_files)


def test_identical_versions_diff_empty(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a")]))
    v2 = t.restore(v1)
    d = t.diff(spark, v1, v2)
    assert d.count() == 0
    assert "_change_type" in d.columns


def test_diff_across_schema_evolution(spark, tmp_path):
    """Additive evolution between the versions: both sides align on
    the union schema (absent columns null), like a snapshot read."""
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(1, "a")]))
    v2 = t.append(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, c long"),
        merge_schema=True,
    )
    got = {
        (r["k"], r["v"], r["c"], r["_change_type"])
        for r in t.diff(spark, v1, v2).collect()
    }
    assert got == {(2, "b", 7, "insert")}


def test_compact_diffs_empty_content(spark, tmp_path):
    """OPTIMIZE moves rows between files without changing content —
    the multiset diff must be empty even though every file changed."""
    t = TxTable(str(tmp_path / "t"))
    v1 = t.append(_kv(spark, [(i, "x") for i in range(50)]))
    t.append(_kv(spark, [(i, "y") for i in range(50, 60)]))
    v3 = t.compact(spark, target_files=1)
    base = t.read(spark, 2)
    assert t.diff(spark, 2, v3).count() == 0
    assert t.read(spark, v3).count() == base.count()
