"""Per-file bloom indexes on TxTables (Delta's bloom-filter index):
point-lookup data skipping where min/max is useless — every file of a
hash-keyed table spans the whole key domain, so range pruning keeps
all files while the bloom prunes to the file(s) holding the key."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


def _hashed_batch(spark, lo: int, hi: int):
    """Rows keyed by md5(id) — high-cardinality, unordered: each
    file's [min, max] range spans ~the whole hex domain."""
    return spark.range(lo, hi).select(
        F.md5(F.col("id").cast("string")).alias("h"),
        F.col("id").alias("payload"),
    )


def _table(spark, tmp_path, n_batches=4, per=200):
    t = TxTable(str(tmp_path / "t"), bloom_cols=("h",))
    for b in range(n_batches):
        t.append(
            _hashed_batch(spark, b * per, (b + 1) * per).coalesce(1)
        )
    return t


def test_point_lookup_prunes_to_owning_file(spark, tmp_path):
    t = _table(spark, tmp_path)
    all_files = t.snapshot_files()
    assert len(all_files) == 4
    key = hashlib.md5(b"42").hexdigest()  # lives in batch 0's file
    kept = t.pruned_files([("h", "=", key)])
    # min/max alone keeps everything (hex ranges overlap)...
    assert len(all_files) == 4
    # ...the bloom prunes to ~1 file (1% FP could keep a second)
    assert 1 <= len(kept) <= 2, kept
    # and the kept set contains the true owner: read_where finds it
    rows = t.read_where(spark, [("h", "=", key)]).collect()
    assert [r["payload"] for r in rows] == [42]


def test_no_false_negatives(spark, tmp_path):
    t = _table(spark, tmp_path, n_batches=2, per=100)
    for i in (0, 57, 99, 100, 199):
        key = hashlib.md5(str(i).encode()).hexdigest()
        rows = t.read_where(spark, [("h", "=", key)]).collect()
        assert [r["payload"] for r in rows] == [i], i


def test_absent_key_prunes_everything_or_nearly(spark, tmp_path):
    t = _table(spark, tmp_path)
    kept = t.pruned_files([("h", "=", "not-a-real-hash")])
    assert len(kept) <= 1  # FP could keep one; usually zero


def test_unindexed_writer_files_are_never_pruned(spark, tmp_path):
    """A handle WITHOUT bloom_cols writes no sidecars; its files must
    always be kept for equality lookups (soundness over coverage)."""
    t = TxTable(str(tmp_path / "t"), bloom_cols=("h",))
    t.append(_hashed_batch(spark, 0, 50).coalesce(1))
    plain = TxTable(t.path)  # no bloom_cols
    plain.append(_hashed_batch(spark, 50, 100).coalesce(1))
    key = hashlib.md5(b"77").hexdigest()  # in the UNINDEXED file
    rows = t.read_where(spark, [("h", "=", key)]).collect()
    assert [r["payload"] for r in rows] == [77]


def test_vacuum_sweeps_sidecars_of_removed_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), bloom_cols=("h",))
    t.append(_hashed_batch(spark, 0, 100).coalesce(1))
    old_files = set(t.snapshot_files())
    t.overwrite(_hashed_batch(spark, 100, 200).coalesce(1))
    t.vacuum(keep_versions=1)
    bloom_dir = os.path.join(t.log_dir, "bloom")
    left = os.listdir(bloom_dir)
    assert left  # the live file's sidecar survives
    assert not any(f.rsplit(".", 2)[0] in old_files for f in left)


def test_range_and_bloom_predicates_compose(spark, tmp_path):
    t = _table(spark, tmp_path, n_batches=2, per=100)
    key = hashlib.md5(b"5").hexdigest()
    # payload range excludes batch 1's file, bloom targets batch 0's
    rows = t.read_where(
        spark, [("h", "=", key), ("payload", "<", 100)]
    ).collect()
    assert [r["payload"] for r in rows] == [5]
