"""The primary correctness gate, run locally: every registered query
with an oracle must match DuckDB on the test fixture (mirrors the
driver's t2 check; SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from etl_tpch_spark import registry

from .oracle_utils import compare, duckdb_con, run_oracle

QUERIES = registry.load_all()
WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle]
ROWS_ONLY = [name for name, q in QUERIES.items() if not q.oracle]


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, oracle, name):
    q = QUERIES[name]
    got = q.fn(spark, sf_dir)
    want = run_oracle(oracle, q.oracle)
    problems = compare(got, want)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
