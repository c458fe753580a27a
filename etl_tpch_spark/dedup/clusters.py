"""Duplicate-cluster resolution: near-dup pairs → connected components.

Pairwise dedup (minhash/simhash/jaccard) emits edges; deduplicating a
corpus needs the *transitive* clusters (A≈B, B≈C ⇒ {A,B,C} is one
group, keep one canonical doc).  This is connected components — an
iterative algorithm no single SQL pass expresses (SURVEY.md §5 notes
such ops get the driver's weaker check; here DuckDB's recursive CTE
can actually replicate it, so the query IS hash-checked).

Algorithm: min-label propagation.  Every doc starts labeled with its
own id; each round every doc takes the min label among itself and its
neighbors; fixpoint after at most (component diameter) rounds.  Each
round is one shuffle (join + groupBy-min) — the driver loop only
orchestrates; data never leaves the cluster.  At 100 TB-scale graphs,
large-star/small-star (Kiveris et al.) halves the round count; plain
propagation is right for dedup graphs whose components are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """(src, dst) edge list → (doc_id, cluster_id) where cluster_id is
    the minimum doc id reachable.  Only ids appearing in an edge are
    returned (singletons are trivially their own cluster).

    Lineage control: every ``checkpoint_interval`` rounds the label
    relation is ``localCheckpoint``-ed (eager) — caching alone does NOT
    truncate the logical plan, so without this each round's plan embeds
    every previous round (the per-query plan report showed ~90 recorded
    shuffles for the 20-round form).  Unbounded lineage is the classic
    iterative-algorithm failure at scale: planning time grows
    quadratically and stack overflows kill the job around iteration
    50-100.  With truncation, plan size is O(interval), not O(rounds).
    On a production cluster prefer ``spark.sparkContext.setCheckpointDir``
    + ``checkpoint()`` (survives executor loss; localCheckpoint trades
    that durability for zero-setup speed, which is right for a
    handful-of-rounds dedup graph)."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)  # edges feed every round
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.d == labels.doc_id)
            .select(F.col("s").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        if (i + 1) % checkpoint_interval == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            # fixpoint test costs one job; cache both sides of the compare
            new_labels = new_labels.cache()
        changed = (
            new_labels.join(labels.withColumnRenamed("cluster_id", "old"),
                            "doc_id")
            .filter(F.col("cluster_id") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_documents(
    docs: DataFrame, pairs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Deduped corpus: drop every doc whose cluster has a smaller id
    (the canonical representative survives; singletons survive
    untouched)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("cluster_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
