"""Shared pytest fixtures: one local SparkSession per test session.

SPARK_GRAFT_TEST_SF_DIR overrides the default sf0.001 fixture dir (use
sf0.01 to mirror the driver's correctness gate exactly; sf0.001 keeps
the suite fast for the inner loop).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tpch_spark.session import get_spark  # noqa: E402

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "etl_tpch_spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
