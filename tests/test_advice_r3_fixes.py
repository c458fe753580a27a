"""Regression tests for the round-3 ADVICE findings:

1. lm.bigram_pairs on empty/whitespace-only text (slice length clamp);
2. TxTable.delete records batch_id on provably-no-op deletes (wiped-
   checkpoint replay must not re-execute against a newer snapshot);
3. delete on an empty table is a benign no-op, not a CAS conflict;
4. _check_evolution validates against the UNION schema on evolved
   snapshots (type drift on a column absent from the sampled file);
5. compact propagates merged_schema when rival appends on an evolved
   chain are carried into the compacted manifest.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


# ------------------------------------------------------------- 1. lm


def test_bigram_pairs_tolerates_empty_text(spark):
    from etl_tpch_spark.functions.lm import bigram_pairs

    docs = spark.createDataFrame(
        [
            ("d1", "hello world hello"),
            ("d2", ""),  # routine in crawl JSON-lines
            ("d3", "   \t  "),
            ("d4", "one"),
            ("d5", None),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in bigram_pairs(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # <2-token docs yield an empty pair array (explode drops them);
    # nothing raises INVALID_PARAMETER_VALUE.LENGTH
    assert got == {"d1": 2}


def test_score_docs_tolerates_empty_text(spark):
    from etl_tpch_spark.functions.lm import (
        bigram_counts,
        lm_from_counts,
        score_docs,
    )

    ref = spark.createDataFrame(
        [("r1", "a b a b", "en", "ref")],
        "doc_id string, text string, lang string, source string",
    )
    docs = spark.createDataFrame(
        [("d1", "a b", "en", "crawl"), ("d2", "", "en", "crawl")],
        "doc_id string, text string, lang string, source string",
    )
    lm = lm_from_counts(bigram_counts(ref))
    out = {r["doc_id"]: r for r in score_docs(docs, lm).collect()}
    assert out["d1"]["n_bigrams"] == 1
    # the empty doc simply contributes no bigram rows
    assert "d2" not in out


# --------------------------------------------------- 2/3. delete no-op


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_delete_on_empty_table_is_not_a_conflict(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    keys = _kv(spark, [(1, "x")]).select("k")
    got = t.delete(spark, keys, "k", batch_id="e0-d")
    assert got is not None  # None is reserved for CAS aborts
    assert "e0-d" in t.applied_batch_ids()


def test_empty_table_delete_replay_cannot_eat_later_upserts(
    spark, tmp_path
):
    """The wiped-checkpoint replay hazard: epoch 0 deletes k=1 on an
    empty table (no-op), epoch 1 upserts k=1, checkpoint dies, epoch 0
    replays.  The recorded batch_id must make the replay a no-op."""
    t = TxTable(str(tmp_path / "t"))
    t.delete(spark, _kv(spark, [(1, "x")]).select("k"), "k",
             batch_id="e0-d")
    t.merge(spark, _kv(spark, [(1, "new")]), "k", batch_id="e1-u")
    # replay of epoch 0's delete half
    t.delete(spark, _kv(spark, [(1, "x")]).select("k"), "k",
             batch_id="e0-d")
    rows = t.read(spark).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "new")]


def test_pruned_noop_delete_records_batch_id(spark, tmp_path):
    """Same hazard when stats-pruning proves nothing matches: the
    no-op must still commit the batch_id."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_kv(spark, [(10, "a"), (20, "b")]))
    # k=99 is outside every file's [min, max] → touched == []
    got = t.delete(spark, _kv(spark, [(99, "-")]).select("k"), "k",
                   batch_id="e0-d")
    assert got is not None
    assert "e0-d" in t.applied_batch_ids()
    t.merge(spark, _kv(spark, [(99, "late")]), "k", batch_id="e1-u")
    t.delete(spark, _kv(spark, [(99, "-")]).select("k"), "k",
             batch_id="e0-d")  # replay
    got_rows = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert (99, "late") in got_rows and len(got_rows) == 3


def test_empty_keyset_delete_records_batch_id(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_kv(spark, [(1, "a")]))
    empty = _kv(spark, []).select("k") if False else (
        spark.createDataFrame([], "k long")
    )
    assert t.delete(spark, empty, "k", batch_id="e0-d") is not None
    assert "e0-d" in t.applied_batch_ids()


def test_unkeyed_noop_delete_commits_nothing(spark, tmp_path):
    """Without a batch_id there is no replay contract — a no-op delete
    must NOT grow the log."""
    t = TxTable(str(tmp_path / "t"))
    t.append(_kv(spark, [(10, "a")]))
    v = t.latest_version()
    assert t.delete(
        spark, _kv(spark, [(99, "-")]).select("k"), "k"
    ) == v
    assert t.latest_version() == v


# --------------------------------------- 4. evolution union validation


def test_evolution_type_drift_caught_on_evolved_column(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    # evolving append ADDS c:long — absent from the v1 files
    t.append(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, c long"),
        merge_schema=True,
    )
    # a second evolving append redefining c as string must be refused:
    # sampling files[0] (a v1 file, no c) would let it through and the
    # table would become unreadable at the parquet mergeSchema step
    with pytest.raises(ValueError, match="cannot change column"):
        t.append(
            spark.createDataFrame(
                [(3, "c", "oops")], "k long, v string, c string"
            ),
            merge_schema=True,
        )
    # the compatible shape still lands
    t.append(
        spark.createDataFrame([(3, "c", 8)], "k long, v string, c long"),
        merge_schema=True,
    )
    assert t.read(spark).count() == 3


# ------------------------------------- 5. compact merged_schema carry


def test_compact_flags_rival_appends_on_evolved_chain(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, c long"),
        merge_schema=True,
    )
    # interleave a rival plain append (narrow shape, legal on an
    # evolved chain) between compact's read phase and its commit
    orig_write = t._write_data
    fired = []

    def write_then_rival(df):
        files = orig_write(df)
        if not fired:
            fired.append(True)
            TxTable(t.path).append(
                spark.createDataFrame([(9, "z")], "k long, v string")
            )
        return files

    t._write_data = write_then_rival
    try:
        v = t.compact(spark, target_files=1)
    finally:
        t._write_data = orig_write
    entry = t.commit_entry(v)
    # the rival's narrow file rides appended_since → flag must persist
    assert entry.get("merged_schema") is True
    got = t.read(spark)
    assert set(got.columns) == {"k", "v", "c"}
    rows = {r["k"]: r["c"] for r in got.collect()}
    assert rows == {1: None, 2: 7, 9: None}
