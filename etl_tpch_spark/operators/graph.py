"""Graph algorithms as DataFrame passes — PageRank.

Companion to dedup/clusters.py's connected components (the other
iterative graph op in the engine): PageRank scores every node of the
similarity graph by how centrally it sits among near-duplicates —
curation pipelines use it to pick the canonical representative of a
duplicate cluster (highest-centrality doc) instead of min-id.

Arithmetic is scaled-integer (rank mass in units of 1e-12) with
truncating integer division everywhere, for the same reason
similarity/kmeans.py quantizes: every intermediate is a BIGINT, so
Spark and the DuckDB unrolled-CTE oracle are bit-identical — no IEEE
summation-order drift, hash-checkable.  All quantities are positive,
where Spark's ``div`` (truncate) and DuckDB's ``//`` (floor) agree.

Scale shape per iteration: one join of the bidirectional edge list
against the rank relation (shuffle on node id) + one aggregate — the
standard message-passing round.  Edge list is localCheckpoint-ed once
(it feeds every round and derives from the applyInPandas cosine
kernel); rank lineage stays O(iterations), truncate further via
checkpoint_interval for long runs (see connected_components notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank unit = 1e-12 of total mass
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(
    pairs: DataFrame,
    *,
    src: str = "vec_a",
    dst: str = "vec_b",
    iterations: int = 3,
) -> DataFrame:
    """Undirected PageRank over an (src, dst) edge list → (node,
    pr_scaled) with pr_scaled = rank in units of 1/SCALE.  Only
    edge-touched nodes participate (every node therefore has degree
    ≥ 1 and incoming mass — no dangling-node term needed)."""
    bi = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint(eager=False)  # feeds every round
    )
    deg = (
        bi.groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("s", "node")
    )
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = deg.crossJoin(n).select(
        "node",
        "deg",
        F.expr(f"CAST({SCALE} div n_nodes AS BIGINT)").alias("pr"),
    )
    for _ in range(iterations):
        contrib = (
            bi.join(ranks, bi["s"] == ranks["node"])
            .select(
                F.col("d").alias("cnode"),
                F.expr("pr div deg").alias("share"),
            )
            .groupBy("cnode")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            deg.crossJoin(n)
            .join(contrib, deg["node"] == contrib["cnode"])
            .select(
                "node",
                "deg",
                F.expr(
                    f"CAST((15 * {SCALE}) div (100 * n_nodes)"
                    f" + ({DAMP_NUM} * contrib) div {DAMP_DEN} AS BIGINT)"
                ).alias("pr"),
            )
        )
    return ranks.select("node", F.col("pr").alias("pr_scaled"))
