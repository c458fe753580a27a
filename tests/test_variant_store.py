"""Stored-VARIANT artifact lifecycle (round 11).

``events_variant_stored`` persists the events payload as a binary
VARIANT parquet column once (parse at ingest) and extracts typed paths
at query time.  These tests pin the lifecycle properties the oracle
diff can't see: the stored column really is the variant logical type
(not a re-stringified JSON), the artifact is built exactly once per
(fixture, stamp) generation, and query results are identical whether
the artifact is cold-built or reused.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_tpch_spark.queries.events import (
    _variant_events_path,
    events_variant_stored,
)


def test_stored_column_is_variant_type(spark, sf_dir):
    data = _variant_events_path(spark, sf_dir)
    schema = spark.read.parquet(data).schema
    assert schema["v"].dataType.typeName() == "variant"
    # and the stored binary extracts without touching JSON text
    n = (
        spark.read.parquet(data)
        .select(F.expr("variant_get(v, '$.k', 'bigint')").alias("k"))
        .where(F.col("k").isNotNull())
        .count()
    )
    assert n > 0


def test_artifact_built_once_and_reused(spark, sf_dir):
    data = _variant_events_path(spark, sf_dir)
    marker = os.path.join(os.path.dirname(data), "_BUILD_COMPLETE")
    assert os.path.exists(marker)
    mtime = os.stat(marker).st_mtime_ns
    # second resolve: same generation dir, no rebuild (marker untouched)
    assert _variant_events_path(spark, sf_dir) == data
    assert os.stat(marker).st_mtime_ns == mtime


def test_query_matches_fresh_json_parse(spark, sf_dir):
    """Stored-binary extraction ≡ parsing the raw JSON at query time —
    storage format must not change semantics (the same claim the
    DuckDB oracle checks from the other direction)."""
    stored = events_variant_stored(spark, sf_dir).sort("k_decile")
    from etl_tpch_spark.catalog import Tables

    raw = Tables(spark, sf_dir).events.select(
        F.parse_json(F.col("props")).alias("v"), "event_type"
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    fresh = (
        raw.select(F.col("event_type"), k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy(F.expr("k DIV 10").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .sort("k_decile")
    )
    assert stored.collect() == fresh.collect()


def test_variant_stream_equals_batch(spark, sf_dir, tmp_path):
    """VARIANT functions under Structured Streaming: parse_json +
    variant_get run in a stateful streaming aggregation (the
    single-agg pair-count form — distinct aggs are unsupported on
    streams), drained with availableNow; the SAME decile-rollup code
    then folds the drained table, and the result must equal the
    stored-artifact batch query bit-for-bit."""
    import os

    from etl_tpch_spark.queries.events import (
        variant_decile_rollup,
        variant_decile_type_counts,
    )
    from etl_tpch_spark.streaming.windows import run_to_memory_sink

    # stage the events parquet as a stream-readable dir (single file
    # fixtures stream fine via file source + schema)
    from etl_tpch_spark.catalog import Tables
    from etl_tpch_spark.schemas import TESTDATA

    events_dir = os.path.join(str(tmp_path), "events")
    Tables(spark, sf_dir).events.write.parquet(events_dir)

    stream = (
        spark.readStream.schema(TESTDATA["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
        .select("event_type", F.parse_json(F.col("props")).alias("v"))
    )
    drained = run_to_memory_sink(
        variant_decile_type_counts(stream),
        "variant_pairs",
        checkpoint_dir=str(tmp_path),
    )
    got = variant_decile_rollup(drained).sort("k_decile").collect()
    want = events_variant_stored(spark, sf_dir).sort("k_decile").collect()
    assert got == want
