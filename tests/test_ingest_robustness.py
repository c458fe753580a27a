"""Ingest robustness tests (pipeline/ingest.py): corrupt JSON lines
must be quarantined (not fatal, not silently dropped), and appended
batches with evolved schemas must unify on read."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_tpch_spark.pipeline.ingest import (
    ingest_table_tolerant,
    read_processed,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def _stage(staging: str, table: str, lines: list[str]) -> None:
    d = os.path.join(staging, table)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{table}_2026-01-01T00.json"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_corrupt_lines_quarantined_good_rows_ingested(spark, tmp_path):
    staging = str(tmp_path / "staging")
    processed = str(tmp_path / "processed")
    quarantine = str(tmp_path / "quarantine")
    _stage(
        staging,
        "kv",
        [
            json.dumps({"k": 1, "val": "a"}),
            "{this is not json",
            json.dumps({"k": 2, "val": "b"}),
            '{"k": "truncated...',
        ],
    )
    n_good, n_bad = ingest_table_tolerant(
        spark, staging, processed, "kv",
        schema=SCHEMA, quarantine_dir=quarantine,
    )
    assert (n_good, n_bad) == (2, 2)
    got = spark.read.parquet(os.path.join(processed, "kv"))
    assert {r.k for r in got.collect()} == {1, 2}
    q = spark.read.json(os.path.join(quarantine, "kv"))
    rows = q.collect()
    assert len(rows) == 2
    assert all(r.source_file.endswith(".json") for r in rows)
    assert any("not json" in r.raw_line for r in rows)


def test_all_good_batch_quarantines_nothing(spark, tmp_path):
    staging = str(tmp_path / "staging")
    processed = str(tmp_path / "processed")
    quarantine = str(tmp_path / "quarantine")
    _stage(staging, "kv", [json.dumps({"k": i, "val": "x"}) for i in range(5)])
    n_good, n_bad = ingest_table_tolerant(
        spark, staging, processed, "kv",
        schema=SCHEMA, quarantine_dir=quarantine,
    )
    assert (n_good, n_bad) == (5, 0)
    assert not os.path.exists(os.path.join(quarantine, "kv"))


def test_schema_evolution_unifies_on_read(spark, tmp_path):
    processed = str(tmp_path / "processed")
    path = os.path.join(processed, "kv")
    v1 = spark.createDataFrame([(1, "a")], SCHEMA)
    v1.write.mode("append").parquet(path)
    # producer adds a column in a later batch
    v2 = spark.createDataFrame([(2, "b")], SCHEMA).withColumn(
        "extra", F.lit(99).cast("long")
    )
    v2.write.mode("append").parquet(path)

    got = read_processed(spark, processed, "kv")
    assert set(got.columns) == {"k", "val", "extra"}
    by_k = {r.k: r for r in got.collect()}
    assert by_k[1].extra is None  # old rows null-filled
    assert by_k[2].extra == 99
