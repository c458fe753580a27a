"""Top-k operators (SURVEY.md §2.5, §2.7).

Two shapes the reference uses/implies:
- global top-k (reference reduce.py:69-72 `sort_values().head(50)`):
  Spark `orderBy(...).limit(k)` → planned as ``TakeOrderedAndProject``
  (per-partition heap + driver merge; never materializes a full sort —
  the right plan at any scale).
- top-k *per group* (reference loops one query per segment,
  reduce.py:81-86): window `row_number() <= k` — one shuffle on the
  group key instead of G full query executions.

Always pass deterministic (tie-broken) ordering columns: floating
revenue ties across engines otherwise make result *sets* unstable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k within each group via row_number window.  At scale, prefer
    this over a per-group loop; for extreme k≪group-size skew, AQE
    handles the partition imbalance."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
