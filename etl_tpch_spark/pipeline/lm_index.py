"""Persisted bigram-LM index — the CCNet production shape.

The batch query (queries/text.py text_lm_quality_filter) retrains the
reference LM from raw text every run.  At the 100 TB design point the
LM is a stored artifact: reference batches are counted ONCE, the count
table lives in a TxTable, and daily crawl ticks score ONLY the new
batch against stored conditionals — no reference text is retokenized,
no scored corpus is rescanned.

Counts (not conditionals) are the stored representation: bigram counts
fold by plain summation, so the stored LM is

1. **appendable** — a new reference batch appends its own (w1, w2,
   n_pair) rows (exactly-once batch ids: a replayed ingest appends
   nothing), and the conditional table derived at read time
   (functions/lm.py lm_from_counts pre-aggregates) is invariant to how
   counts were batched;
2. **compactable** — ``fold`` rewrites accumulated batch rows into one
   row per (w1, w2), pinned to the version it read (compare-and-swap;
   a rival ingest aborts the fold, not the other way around);
3. **shared-definition** — counting and scoring are the SAME helpers
   the query uses (functions/lm.py), so indexed scoring equals the
   query by construction (tests/test_lm_index.py pins equality).

This is the same lifecycle as the MinHash signature index
(dedup/index.py), the span window index (dedup/spans.py) and the HLL
register index (pipeline/hll_index.py), applied to a trained model
artifact.  Reference parity: the reference keeps derived state in
Delta tables between runs (reference pipeline/preprocess.py:41-76); a
statistical-LM counterpart is north-star scope (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lm import bigram_counts, lm_from_counts, score_docs
from .txlog import TxTable


class LmIndex:
    """A TxTable of (w1, w2, n_pair) bigram counts over the reference
    corpus slice."""

    def __init__(self, path: str) -> None:
        self.table = TxTable(path)

    def ingest(
        self, ref_docs: DataFrame, *, batch_id: str | None = None
    ) -> int:
        """Count one reference batch's bigrams and append (idempotent
        on batch_id).  One pass over the NEW reference text only."""
        return self.table.append(
            bigram_counts(ref_docs), batch_id=batch_id
        )

    def counts(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Raw stored count rows (possibly several per bigram — one
        per ingest batch; summed on read by lm_from_counts)."""
        return self.table.read(spark, version)

    def lm(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """The conditional table (w1, w2, p_micro) derived from stored
        counts — batching-invariant (counts pre-aggregate by sum)."""
        return lm_from_counts(self.counts(spark, version))

    def score(
        self, spark: SparkSession, docs: DataFrame
    ) -> DataFrame:
        """Score ``docs`` against the stored LM — the daily-crawl
        tick: one pass over the NEW docs joined to the index (the
        reference corpus contributes a columnar scan of stored counts,
        zero retokenization).  Same scoring helper as the query ⇒
        identical numbers."""
        return score_docs(docs, self.lm(spark))

    def fold(self, spark: SparkSession) -> int | None:
        """Count-aware OPTIMIZE: overwrite accumulated batch rows with
        their sum, one row per (w1, w2).  Derived conditionals are
        unchanged (sum is associative); the table size becomes the
        vocabulary-pair count regardless of how many ingests ever ran.
        Pinned to the version the merge was read from — a rival ingest
        landing in between aborts the fold (returns None; folding is
        optional hygiene, the next maintenance pass retries)."""
        start_v = self.table.latest_version()
        if start_v is None:
            return None
        merged = (
            self.table.read(spark, version=start_v)
            .groupBy("w1", "w2")
            .agg(F.sum("n_pair").alias("n_pair"))
        )
        return self.table.overwrite(merged, expect_version=start_v)
