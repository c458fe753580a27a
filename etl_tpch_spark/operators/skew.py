"""Skew mitigation: salted joins and two-stage salted aggregation.

Not in the reference (its Dask shuffle simply suffers under skew).  At
100 TB a single hot key (one viral order, one empty-string join key)
can put an entire shuffle partition on one executor.  Two standing
remedies beyond AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin`` — on in session.py):

- **salted join**: append a random salt ∈ [0, n) to the skewed side's
  key and replicate the other side n times (one copy per salt value) —
  the hot key's rows spread over n reducers at the cost of an n× blowup
  of the replicated side.  Use when the replicated side is too big to
  broadcast but n× its size still beats one hot reducer.
- **salted aggregation**: aggregate on (key, salt) first — spreading a
  hot group over n partial groups — then re-aggregate on key.  Works
  for any algebraic aggregate (sum/count/min/max); both stages are
  hash aggregates with map-side partials.

AQE's skew handling is preferred when it applies (sort-merge joins it
can observe); explicit salting is for the cases it can't — aggregation
skew, and joins already shuffled by an upstream stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the skewed side
    salted and ``other`` replicated ``n_salts``×.  Result equals the
    plain join (the salt is internal; dropped on return).  ``how``
    supports inner/left (the replicated side must be the non-preserved
    side for outer correctness)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    s = skewed.withColumn(
        _SALT, (F.rand(seed) * n_salts).cast("int")
    )
    o = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, [on, _SALT], how)
    return out.drop(_SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max}.  Stage 1 aggregates on keys+salt, stage 2
    merges partials on keys (count partials merge by sum).
    """
    _MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, (_, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    salted = df.withColumn(_SALT, (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, _MERGE[fn])(out).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — run before choosing n_salts."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 4))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
