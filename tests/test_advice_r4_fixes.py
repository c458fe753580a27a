"""Regression tests for the round-4 ADVICE findings:

1. bloom sidecar probe unifies int/float keys (int 5 must hit a file
   whose stored column holds 5.0 — the bloom must never be LESS sound
   than the min/max stats check it augments);
2. corpus_cycle guards each CHECK constraint independently and refuses
   a quality_floor below the installed constraint instead of crashing
   the append mid-write;
3. bm25_topk / SearchIndex.search tolerate empty and duplicated terms
   (raw CLI input), and multi-word raw terms are tokenized like the
   index tokenized at ingest;
4. vacuum sweeps bloom sidecars by data-file prefix and the sidecar
   filename hex-encodes the column name (dots / path separators in a
   column name neither break the sweep nor escape the bloom dir);
5. add_constraint succeeds on a table whose current snapshot lists
   zero data files (only no-op delete commits).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


# ------------------------------------------------- 1. bloom key types


def test_bloom_probe_numeric_type_mismatch(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), bloom_cols=("v",))
    t.append(
        spark.createDataFrame(
            [(1, 5.0), (2, 7.5)], "id long, v double"
        ).coalesce(1)
    )
    files = t.snapshot_files()
    # int literal probing a double column: must NOT false-negative
    assert t._bloom_might_contain(files[0], "v", 5)
    assert t._bloom_might_contain(files[0], "v", 5.0)
    # pruned_files keeps the file for the int form of the predicate
    assert t.pruned_files([("v", "=", 5)]) == files
    # and a genuinely absent value still prunes
    assert t.pruned_files([("v", "=", 6.0)]) == []


def test_bloom_probe_int_column_float_literal(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), bloom_cols=("v",))
    t.append(
        spark.createDataFrame(
            [(1, 5), (2, 9)], "id long, v long"
        ).coalesce(1)
    )
    files = t.snapshot_files()
    assert t._bloom_might_contain(files[0], "v", 5.0)
    assert t.pruned_files([("v", "=", 9.0)]) == files


# ------------------------------------- 2. corpus constraint installs


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): ~8 s lifecycle e2e
def test_corpus_cycle_refuses_lower_floor(spark, tmp_path):
    from etl_tpch_spark.pipeline.corpus import corpus_cycle

    root = str(tmp_path / "root")
    corpus_cycle(
        spark,
        _docs(spark, [(1, "good text with many words here", "en", "a")]),
        root,
        batch_id="b1",
        quality_floor=0.2,
    )
    with pytest.raises(ValueError, match="below the installed"):
        corpus_cycle(
            spark,
            _docs(spark, [(2, "more text", "en", "a")]),
            root,
            batch_id="b2",
            quality_floor=0.1,
        )
    # equal or higher floors still run
    corpus_cycle(
        spark,
        _docs(spark, [(3, "third doc text goes here now", "en", "a")]),
        root,
        batch_id="b3",
        quality_floor=0.2,
    )


def test_corpus_cycle_installs_split_domain_independently(
    spark, tmp_path
):
    """quality_floor pre-installed (simulating a crash between the two
    installs of an older build): the next cycle must still install
    split_domain rather than skipping it forever."""
    from etl_tpch_spark.pipeline.corpus import corpus_cycle

    root = str(tmp_path / "root")
    corpus = TxTable(os.path.join(root, "corpus"))
    corpus.add_constraint(spark, "quality_floor", "quality >= 0.2")
    corpus_cycle(
        spark,
        _docs(spark, [(1, "good text with many words here", "en", "a")]),
        root,
        batch_id="b1",
        quality_floor=0.2,
    )
    assert "split_domain" in corpus.constraints()


# --------------------------------------------- 3. bm25 raw-term input


def test_bm25_topk_empty_and_duplicate_terms(spark):
    from etl_tpch_spark.functions.bm25 import bm25_topk

    tf = spark.createDataFrame(
        [(1, "apple", 3), (2, "apple", 1)],
        "doc_id long, term string, tf long",
    )
    dl = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, dl long"
    )
    assert bm25_topk(tf, dl, [], 5).count() == 0
    once = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(tf, dl, ["apple"], 5).collect()
    }
    twice = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(tf, dl, ["apple", "apple"], 5).collect()
    }
    assert once == twice  # duplicate term must not double the score


def test_search_normalizes_raw_terms(spark, tmp_path):
    from etl_tpch_spark.pipeline.search_index import SearchIndex

    idx = SearchIndex(str(tmp_path / "idx"))
    idx.ingest(
        spark.createDataFrame(
            [(1, "apple banana"), (2, "banana cherry")],
            "doc_id long, text string",
        ),
        batch_id="b1",
    )
    # multi-word raw term tokenizes like ingest did; empties drop
    multi = {r["doc_id"] for r in idx.search(spark, ["apple banana"], 5).collect()}
    clean = {r["doc_id"] for r in idx.search(spark, ["apple", "banana"], 5).collect()}
    assert multi == clean == {1, 2}
    assert idx.search(spark, ["", "   "], 5).count() == 0
    dup = idx.search(spark, ["apple", "apple"], 5).collect()
    ref = idx.search(spark, ["apple"], 5).collect()
    assert {(r["doc_id"], r["bm25"]) for r in dup} == {
        (r["doc_id"], r["bm25"]) for r in ref
    }


# --------------------------------------- 4. sidecar filename / sweep


def test_vacuum_sweeps_sidecars_of_dotted_column(spark, tmp_path):
    col = "a.b"
    t = TxTable(str(tmp_path / "t"), bloom_cols=(col,))
    df = spark.createDataFrame(
        [(1, "x")], "id long, `a.b` string"
    ).coalesce(1)
    t.append(df)
    old = set(t.snapshot_files())
    bloom_dir = os.path.join(t.log_dir, "bloom")
    assert len(os.listdir(bloom_dir)) == 1
    t.overwrite(df)  # old file becomes unreferenced
    t.vacuum(keep_versions=1)
    left = os.listdir(bloom_dir)
    # the removed file's sidecar is gone; the live file's remains
    assert all(not f.startswith(next(iter(old)) + ".") for f in left)
    assert len(left) == 1


def test_bloom_path_encodes_separators(tmp_path):
    t = TxTable(str(tmp_path / "t"), bloom_cols=("a/../b",))
    p = t._bloom_path("f.parquet", "a/../b")
    assert os.path.dirname(p) == os.path.join(t.log_dir, "bloom")
    assert "/../" not in os.path.basename(p)


# ------------------------------- 5. constraint on file-less snapshot


def test_add_constraint_on_fileless_snapshot(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    # first commit is a no-op delete (a CDC stream whose first epoch
    # holds only deletes): a version exists but lists zero data files
    t.delete(
        spark,
        spark.createDataFrame([(1,)], "id long"),
        "id",
        batch_id="e0",
    )
    assert t.latest_version() is not None
    assert t.snapshot_files() == []
    t.add_constraint(spark, "pos", "id > 0")
    assert "pos" in t.constraints()
