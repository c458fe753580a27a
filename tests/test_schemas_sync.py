"""Declared schemas must stay in sync with the driver parquet fixtures —
a silent drift (new column, widened type) would make the streaming/JSON
readers (which *trust* schemas.py, no inference) drop or mistype data."""

from __future__ import annotations

import pytest

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.schemas import LIVE, TABLE_NAMES, TESTDATA


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_declared_schema_matches_parquet(spark, sf_dir, table):
    actual = load_table(spark, sf_dir, table).schema
    declared = TESTDATA[table]
    assert [f.name for f in actual.fields] == [
        f.name for f in declared.fields
    ], f"{table}: column names/order drifted"
    for af, df in zip(actual.fields, declared.fields):
        # timestamps: parquet reads as TIMESTAMP_NTZ, declared as
        # TimestampType — both µs-precision; treat as equivalent
        a, d = af.dataType.simpleString(), df.dataType.simpleString()
        if {a, d} <= {"timestamp", "timestamp_ntz"}:
            continue
        assert a == d, f"{table}.{af.name}: {a} != {d}"


def test_live_schema_only_differs_in_dynamic_tables():
    """LIVE (reference pipeline naming) deviates from TESTDATA only in
    the two re-keyed/re-stamped dynamic tables (FIXTURES.md §B)."""
    for t in TABLE_NAMES:
        if t in ("orders", "lineitem"):
            assert LIVE[t] != TESTDATA[t]
        else:
            assert LIVE[t] == TESTDATA[t], t
