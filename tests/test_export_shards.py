"""Deterministic shuffle-shard export (pipeline/export.py): stable
membership, reproducible runs, append-stability, balanced sizes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.export import (
    export_shards,
    read_shard,
    shard_assignments,
)

N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")


def test_export_covers_all_rows_balanced(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    counts = export_shards(docs, path, ["doc_id"], N_SHARDS)
    total = docs.count()
    assert sum(counts.values()) == total
    assert set(counts) == set(range(N_SHARDS))
    # xxhash64 spreads uniformly: no shard more than 2x the mean
    mean = total / N_SHARDS
    assert max(counts.values()) < 2 * mean


def test_rerun_produces_identical_shards(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_shards(docs, p1, ["doc_id"], N_SHARDS)
    # different input partitioning must not change shard membership/order
    export_shards(docs.repartition(13), p2, ["doc_id"], N_SHARDS)
    for s in range(N_SHARDS):
        a = [r.doc_id for r in read_shard(spark, p1, s).collect()]
        b = [r.doc_id for r in read_shard(spark, p2, s).collect()]
        assert a == b  # same rows, same deterministic shuffle order


def test_append_does_not_move_old_rows(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") % 2 == 0)
    before = {
        r.doc_id: r.shard
        for r in shard_assignments(old, ["doc_id"], N_SHARDS).collect()
    }
    after = {
        r.doc_id: r.shard
        for r in shard_assignments(docs, ["doc_id"], N_SHARDS)
        .filter(F.col("doc_id") % 2 == 0)
        .collect()
    }
    assert before == after  # content addressing: appends never reshard


def test_shuffle_order_is_not_ingest_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    export_shards(docs, path, ["doc_id"], 2)
    ids = [r.doc_id for r in read_shard(spark, path, 0).collect()]
    assert ids != sorted(ids)  # hash order ≠ key order (a real shuffle)
    assert len(ids) > 10


def test_rejects_bad_shard_count(docs):
    with pytest.raises(ValueError):
        shard_assignments(docs, ["doc_id"], 0)
