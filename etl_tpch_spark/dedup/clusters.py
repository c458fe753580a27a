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
) -> DataFrame:
    """(src, dst) edge list → (doc_id, cluster_id) where cluster_id is
    the minimum doc id reachable.  Only ids appearing in an edge are
    returned (singletons are trivially their own cluster)."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.d == labels.doc_id)
            .select(F.col("s").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # fixpoint test costs one job; cache both sides of the compare
        new_labels = new_labels.cache()
        changed = (
            new_labels.join(labels.withColumnRenamed("cluster_id", "old"),
                            "doc_id")
            .filter(F.col("cluster_id") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist() if hasattr(labels, "unpersist") else None
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
