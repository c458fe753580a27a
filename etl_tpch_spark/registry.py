"""Central query registry — single source of truth for the driver contract.

Every operator/query in the engine registers here with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``;
- optionally the equivalent ANSI SQL the DuckDB oracle runs on the same
  parquet tables (None ⇒ driver records the weaker rows-only check — used
  only for genuinely non-SQL-expressible ops like hash-dependent LSH).

``__spark_entry__.queries()`` / ``oracle_sql()`` just read this dict, so
a query and its correctness check always land together (SURVEY.md §5).

Oracle-matching rules observed throughout the engine:
- alias every computed column identically in Spark and SQL (driver sorts
  columns by name before hashing);
- round order-dependent float aggregates (sums/avgs) to 2 decimals on
  both sides — per-row float arithmetic is bit-exact across engines, but
  summation order is not;
- cast count-like results to BIGINT on the DuckDB side (DuckDB sums of
  integers widen to HUGEINT, Spark stays long);
- pin session timezone UTC (session.py) so timestamps agree.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


# Modules whose import populates REGISTRY.  Order = SURVEY.md §2 families.
_QUERY_MODULES = (
    "etl_tpch_spark.queries.flagship",
    "etl_tpch_spark.queries.tpch",
    "etl_tpch_spark.queries.tpch_partsupp",
    "etl_tpch_spark.queries.sql_api",
    "etl_tpch_spark.queries.relational_ops",
    "etl_tpch_spark.queries.profiling",
    "etl_tpch_spark.queries.events",
    "etl_tpch_spark.queries.timeseries",
    "etl_tpch_spark.queries.text",
    "etl_tpch_spark.queries.dedup",
    "etl_tpch_spark.queries.similarity",
    "etl_tpch_spark.queries.curation",  # after similarity: reuses its oracle
    "etl_tpch_spark.queries.graph",  # after similarity: reuses its oracle
    "etl_tpch_spark.queries.inference",
    "etl_tpch_spark.queries.multimodal",
)

_loaded = False


def load_all() -> dict[str, Query]:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            try:
                importlib.import_module(mod)
            except ModuleNotFoundError as e:
                # allow incremental build-out: a family not written yet
                # just contributes nothing, but a typo inside a module
                # must not be swallowed.
                if e.name != mod:
                    raise
        _loaded = True
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
