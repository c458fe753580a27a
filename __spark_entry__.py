"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in :mod:`etl_tpch_spark.registry` — every query
module registers its Spark callable together with its DuckDB oracle SQL,
so this file is a thin adapter and can never drift from the engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_tpch_spark import registry
from etl_tpch_spark.session import tune_for_oracle

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference pipeline/reduce.py:24-78 as Spark) on
    sf0.001; driver checks rows>0."""
    from etl_tpch_spark.queries.flagship import unshipped_orders_by_revenue

    tune_for_oracle(spark)
    return unshipped_orders_by_revenue(spark, SMOKE_SF_DIR, "BUILDING")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (registered alongside
    each Spark implementation).  Even the LSH/minhash/IVF operators are
    hash-checked (deterministic md5/LCG randomness, sequential float
    folds — dedup/hashing.py); the only rows-only entry is the
    Python-side multimodal featurization."""
    return registry.oracle_sql()
