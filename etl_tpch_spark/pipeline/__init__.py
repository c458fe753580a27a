"""Incremental ETL pipeline stages (SURVEY.md §7 Milestone 2).

The reference is a scheduled micro-batch pipeline of four flows
(reference workflow.py:12-31): generate → ingest → compact → reduce.
Each stage here is a plain function over a SparkSession + directories, so
any scheduler (cron, Airflow, Prefect) can drive it; the Structured
Streaming variant of ingest lives in ``etl_tpch_spark.streaming``.

Zones follow the reference's medallion layout (settings.py:31-34):
``staging/`` JSON-lines (bronze) → ``processed/`` parquet tables
(silver) → ``results/`` query outputs (gold).
"""

from .compact import compact_table, compact_all
from .generate import incrementalize
from .ingest import ingest_table, ingest_all, list_staged_files
from .reduce import query_reduce, unshipped_orders_live

__all__ = [
    "incrementalize",
    "ingest_table",
    "ingest_all",
    "list_staged_files",
    "compact_table",
    "compact_all",
    "query_reduce",
    "unshipped_orders_live",
]
