"""Shared BM25 scoring kernel — ONE definition used by the full-scan
query (queries/text.py text_bm25_topk) and the persisted inverted
index (pipeline/search_index.py SearchIndex.search), so index-served
retrieval equals the query by construction (the same discipline as
functions/lm.py for the LM lifecycle).

Inputs are the two relations an inverted index stores:

- ``tf``  — (doc_id, term, tf) term frequencies, already restricted to
  the query's terms (the postings probe);
- ``dl``  — (doc_id, dl) document lengths over the WHOLE corpus (BM25's
  length normalization needs N and avgdl over all docs, not just docs
  matching the query).

Cross-engine exactness (the repo's no-libm discipline, see
text_bm25_topk's docstring): idf is the sqrt-damped rational form
sqrt((N - df + 0.5)/(df + 0.5)) — IEEE correctly-rounded on both
engines where ln is not — and per-doc scores sum the query terms in
FIXED syntactic order (conditional-max pivot, then s0+s1+…), so Spark
and DuckDB doubles agree bit-for-bit before the 4-digit round.

Reference scope note: coiled/etl-tpch has no retrieval counterpart;
lexical search is north-star LLM-pipeline surface (SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = "CAST(1.2 AS DOUBLE)"
K1P1 = "CAST(2.2 AS DOUBLE)"  # k1 + 1
ONE_MINUS_B = "CAST(0.25 AS DOUBLE)"  # 1 - b
B = "CAST(0.75 AS DOUBLE)"


def bm25_topk(
    tf: DataFrame,
    dl: DataFrame,
    terms: Sequence[str],
    topk: int,
    df: DataFrame | None = None,
) -> DataFrame:
    """Top-``topk`` (doc_id, bm25) for a bag-of-terms query (k1=1.2,
    b=0.75).  ``tf`` carries only the query terms' postings; ``dl``
    carries every document's length.  Scale shape: ``df`` is a
    |terms|-row broadcast, corpus stats are one 1-row join, and the
    only shuffle proportional to data is the tf⋈dl join on doc_id —
    |postings of query terms| rows, not the corpus.

    ``terms`` is defensively deduplicated (first occurrence wins): a
    duplicated term would otherwise produce two identical pivot
    columns and be summed twice, silently inflating scores.  An empty
    term set returns an empty (doc_id, bm25) frame — reachable from
    the CLI ``search`` command with no valid tokens.

    ``df`` optionally supplies the per-term document frequencies
    (term, df) instead of deriving them from ``tf`` — the MaxScore
    path (SearchIndex.search_pruned) restricts ``tf`` to candidate
    docs, so idf must be computed from the UNRESTRICTED postings or
    non-essential terms would silently gain idf."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        return tf.select(
            F.col("doc_id"), F.lit(0.0).alias("bm25")
        ).limit(0)
    # NOTE: two branches read ``dl`` (the corpus-stats scalar and the
    # weights join) and, when ``df`` is derived here, two read ``tf``
    # (df and the weights join) — a caller whose tf/dl lineage is
    # expensive to recompute should materialize before calling (the
    # corpus-derived text_bm25_topk does; measured −20% there).  Not
    # checkpointed HERE: the indexed path's probe scans are cheap,
    # its plan stays auditable (tests pin that search() reads index
    # files only), and a serving tier keeps its latency shape.
    st = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    if df is None:
        df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # one parser round-trip per projection/aggregate instead of
    # per-node py4j construction (round 11; same operators/trees —
    # the conditional-max pivot and fixed s0+s1+… sum order that the
    # cross-engine exactness contract requires are unchanged)
    from ..exprs import sql_str

    w = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .selectExpr(
            "doc_id",
            "term",
            f"sqrt((n - df + CAST(0.5 AS DOUBLE))"
            f" / (df + CAST(0.5 AS DOUBLE)))"
            f" * (tf * {K1P1})"
            f" / (tf + {K1} * ({ONE_MINUS_B} + {B} * dl / avgdl)) AS w",
        )
    )
    pivoted = w.groupBy("doc_id").agg(
        *[
            F.expr(
                f"max(CASE WHEN term = {sql_str(term)} THEN w END) AS s{i}"
            )
            for i, term in enumerate(terms)
        ]
    )
    total = " + ".join(
        f"coalesce(s{i}, CAST(0 AS DOUBLE))" for i in range(len(terms))
    )
    return (
        pivoted.selectExpr("doc_id", f"round({total}, 4) AS bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(topk)
    )
