"""Deterministic float aggregates for oracle-diffed queries.

Problem: ``sum(double)`` is order-dependent (IEEE addition is not
associative), and Spark's partial/final aggregation order differs from
DuckDB's — so two correct engines produce sums differing at the 1e-9
level, which occasionally flips a ``round(x, 2)`` across a .005
boundary and fails the driver's value-hash.  Casting the *product* to
decimal doesn't help either: a 6-decimal product rounded to a 4-decimal
decimal hits exact midpoints ~1% of rows, where Spark (exact BigDecimal
HALF_UP) and DuckDB (scale-multiply in double) disagree.

Fix: the raw inputs are exact 2-decimal quantities stored as doubles
(TPC-H money/discount/tax), so ``CAST(col AS DECIMAL(p,2))`` recovers
the exact decimal on both engines (nearest-double error ≪ 0.005, and
both engines round-to-nearest).  All arithmetic then happens in decimal
— exact, order-independent — and only the final rounded result is cast
back to double.  Verified empirically: Spark and DuckDB produce
bit-identical doubles for sum/round/cast chains built this way, and both
round decimal ties half-away-from-zero.

Precision budget: keep operand precisions tight (money 12,2; rate 4,2;
qty 4,1) so products stay far below Spark's 38-digit cap — crossing it
triggers scale reduction (precision loss) and breaks exactness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(c: Column) -> Column:
    """Exact 2-decimal money value (|x| < 10^10)."""
    return c.cast("decimal(12,2)")


def money8(c: Column) -> Column:
    """Exact 2-decimal small money value (|x| < 10^6), for tight products."""
    return c.cast("decimal(8,2)")


def rate(c: Column) -> Column:
    """Exact 2-decimal rate (discount/tax, |x| < 100)."""
    return c.cast("decimal(4,2)")


def qty(c: Column) -> Column:
    """Exact quantity (integer-valued double ≤ 999)."""
    return c.cast("decimal(4,1)")


def one() -> Column:
    """Literal 1 as a tight decimal so (1 - rate) stays DECIMAL(5,2)."""
    return F.lit("1.00").cast("decimal(3,2)")


def rev_dec() -> Column:
    """The TPC-H revenue term l_extendedprice * (1 - l_discount) as an
    exact decimal expression (DECIMAL(18,4))."""
    return money(F.col("l_extendedprice")) * (one() - rate(F.col("l_discount")))


# SQL (DuckDB) twins of the above — same types, same exact arithmetic.
SQL_ONE = "CAST(1 AS DECIMAL(3,2))"
SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    f" * ({SQL_ONE} - CAST(l_discount AS DECIMAL(4,2)))"
)


def sql_money(col: str) -> str:
    return f"CAST({col} AS DECIMAL(12,2))"


def sql_rate(col: str) -> str:
    return f"CAST({col} AS DECIMAL(4,2))"


def dsum(expr: Column, alias: str, nd: int = 2) -> Column:
    """Exact decimal sum → round(nd) in decimal → double.  ``expr`` must
    be built from the exact-decimal constructors above."""
    return F.round(F.sum(expr), nd).cast("double").alias(alias)


def davg(expr: Column, count_col: Column, alias: str, nd: int = 2) -> Column:
    """Exact decimal sum cast to double / exact count — single IEEE
    division is deterministic across engines."""
    return F.round(F.sum(expr).cast("double") / F.count(count_col), nd).alias(
        alias
    )


def dratio(
    num: Column, den: Column, alias: str, nd: int = 4, scale: float = 1.0
) -> Column:
    """Deterministic ratio of two exact decimal sums."""
    return F.round(
        F.lit(scale) * F.sum(num).cast("double") / F.sum(den).cast("double"),
        nd,
    ).alias(alias)


def sql_dsum(expr: str, alias: str, nd: int = 2) -> str:
    return f"CAST(round(sum({expr}), {nd}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, count_col: str, alias: str, nd: int = 2) -> str:
    return (
        f"round(CAST(sum({expr}) AS DOUBLE) / count({count_col}), {nd})"
        f" AS {alias}"
    )
