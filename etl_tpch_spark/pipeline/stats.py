"""Table/column statistics — the optimizer-feeding surface.

The reference has no statistics machinery at all (SURVEY.md §4: "CBO
join reorder needs ANALYZE stats" is listed as Catalyst-built-in but
unused).  At 100 TB statistics are not optional: without rowCount/NDV
the cost-based optimizer cannot reorder multi-fact joins or pick
broadcast candidates beyond the static 10 MB threshold.

Two layers:

- :func:`column_profile` — one-scan column profiling (count / nulls /
  min / max / exact NDV) as a plain DataFrame, usable on any relation
  (also the data-quality report every ingest pipeline publishes).
  Single aggregation pass + local unpivot of the one result row: the
  scan cost is one read of the projected columns regardless of how
  many stats are requested.
- :func:`analyze_table` — ANALYZE TABLE on a catalog table so Catalyst
  itself sees rowCount/sizeInBytes (and per-column stats with
  FOR COLUMNS); :func:`table_stats` reads back what the optimizer will
  use.  With ``spark.sql.cbo.enabled=true`` these drive join reordering
  and accurate broadcast decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column stats for numeric columns, one scan: (column, n_rows,
    n_not_null, min_value, max_value, ndv).  Output is one row per
    column via a stack() unpivot of the single aggregate row — the
    unpivot touches one row, so the whole job is scan + one reduce."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__min, {c}__max, {c}__ndv" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_not_null, min_value, max_value, ndv)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_not_null", "min_value", "max_value", "ndv")


def analyze_table(
    spark: SparkSession, table: str, *, columns: list[str] | None = None
) -> None:
    """Run ANALYZE TABLE so the catalog carries rowCount/sizeInBytes
    (and per-column min/max/NDV/null stats when ``columns`` given) —
    the input the CBO needs for join reordering at scale."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS "
            f"FOR COLUMNS {', '.join(columns)}"
        )


def table_stats(spark: SparkSession, table: str) -> dict[str, str]:
    """Catalog statistics as seen by the optimizer (from DESCRIBE
    EXTENDED's Statistics row), e.g. {'sizeInBytes': '…', 'rowCount':
    '…'}."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r.col_name == "Statistics":
            # e.g. "123456 bytes, 1500 rows"
            for part in r.data_type.split(","):
                part = part.strip()
                if part.endswith("bytes"):
                    out["sizeInBytes"] = part.split()[0]
                elif part.endswith("rows"):
                    out["rowCount"] = part.split()[0]
    return out
