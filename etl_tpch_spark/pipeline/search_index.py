"""Persisted inverted index — lexical retrieval's production shape.

The batch query (queries/text.py text_bm25_topk) tokenizes the whole
corpus every run.  At the 100 TB design point the inverted index is a
stored artifact: each crawl batch is tokenized ONCE, its postings and
document lengths land in TxTables, and a search probes ONLY the query
terms' postings — the classic inverted-file contract (term → postings
list) expressed as lakehouse tables with data skipping:

- **postings** (term, doc_id, tf), written with ``bloom_cols=("term",)``
  — every file carries a per-file bloom sidecar over its terms, and
  ``optimize()`` range-clusters files BY TERM, so a single-term probe
  opens the one file (of N) whose [min,max] term range matches and
  whose bloom admits the term.  The probe is a driver-side pruning
  decision from the commit log + sidecars; executors never touch
  non-matching postings files.
- **doclens** (doc_id, dl) — BM25's length normalization needs N and
  avgdl over ALL docs; a constant-width scan of one long per doc
  (at 100 TB of text this table is ~0.01% of the corpus).

Lifecycle properties (the same contract as the MinHash/span/LM/HLL/IVF
indexes — dedup/index.py, dedup/spans.py, pipeline/lm_index.py,
pipeline/hll_index.py, similarity/index.py):

1. **O(new) ticks** — ``ingest`` tokenizes only the new batch; no
   stored posting is re-derived, no old text re-read.
2. **exactly-once** — both table appends are idempotent under
   batch-id suffixes (``-po`` / ``-dl``); a crash BETWEEN the two
   commits replays to completion (the landed half no-ops, the missing
   half lands), the same two-table pattern as stream_apply_cdc.
3. **shared definition** — search scores with functions/bm25.py, the
   SAME kernel the full-scan query uses, so ``text_bm25_topk_indexed``
   equals ``text_bm25_topk`` by construction (pinned in
   tests/test_search_index.py).

Reference parity: the reference keeps derived state in Delta tables
between runs (reference pipeline/preprocess.py:41-76); an inverted
index is north-star retrieval scope (SURVEY.md §2 "beyond the
reference").  This also upgrades search_hybrid_rrf's lexical channel
from corpus scan to index probe (queries/search.py).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bm25 import bm25_topk
from ..functions.text import tokens
from .txlog import TxTable


class SearchIndex:
    """Inverted file over a crawl corpus: postings + doclens TxTables
    with term-directed data skipping."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.postings = TxTable(
            os.path.join(path, "postings"), bloom_cols=("term",)
        )
        self.doclens = TxTable(os.path.join(path, "doclens"))

    # ------------------------------------------------------------ write
    def ingest(
        self, docs: DataFrame, *, batch_id: str | None = None
    ) -> None:
        """Tokenize ONE new crawl batch (doc_id, text) and append its
        postings and doclens.  Each doc_id must arrive in exactly one
        batch (the crawl contract every index in this repo shares);
        replays no-op per table, and a crash between the two commits
        completes on replay."""
        # null text tokenizes to a null array, whose size() is -1 —
        # coalesce to '' so an empty crawl doc contributes dl=0 and no
        # postings instead of corrupting avgdl (the same external-input
        # hazard the LM's bigram_pairs clamps)
        toks = docs.select(
            "doc_id",
            tokens(F.coalesce(F.col("text"), F.lit(""))).alias("toks"),
        )
        dl = toks.select(
            "doc_id", F.size("toks").cast("long").alias("dl")
        )
        tf = (
            toks.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        self.doclens.append(
            dl, batch_id=None if batch_id is None else f"{batch_id}-dl"
        )
        self.postings.append(
            tf, batch_id=None if batch_id is None else f"{batch_id}-po"
        )

    def optimize(self, spark: SparkSession, target_files: int = 8) -> None:
        """Maintenance-cadence layout pass: range-cluster postings BY
        TERM into ``target_files`` files (each owns a disjoint term
        range; bloom sidecars are rewritten with the files), and
        compact doclens to one file.  Probe cost afterwards is one or
        two files per term regardless of how many ingest batches ever
        ran."""
        self.postings.compact(
            spark, target_files, cluster_by=("term", "doc_id")
        )
        self.doclens.compact(spark, 1)

    # ------------------------------------------------------------- read
    def probe(
        self, spark: SparkSession, terms: Sequence[str]
    ) -> DataFrame:
        """The query terms' postings — ONE scan of the files any of
        the terms could live in (per-term union of term-range stats +
        per-file bloom sidecars, decided on the driver), filtered to
        the term set.  A 3-term BM25 query and a 300-term hybrid
        query-doc probe both cost one pruned scan, not |terms| reads.
        Returns (doc_id, term, tf); an empty or never-ingested index
        probes to an empty frame, not an error."""
        files = sorted(self.probed_files(terms)) if terms else []
        if not files:
            # no file can hold any query term (or the index is empty):
            # empty frame, schema recovered from ONE snapshot file when
            # any exists, declared when none does
            snap = (
                self.postings.snapshot_files()
                if self.postings.latest_version() is not None
                else []
            )
            if snap:
                probed = spark.read.parquet(
                    os.path.join(self.postings.path, snap[0])
                ).where(F.lit(False))
            else:
                probed = spark.createDataFrame(
                    [], "doc_id LONG, term STRING, tf LONG"
                )
        else:
            probed = spark.read.parquet(
                *[os.path.join(self.postings.path, f) for f in files]
            ).filter(F.col("term").isin(*terms))
        # one row per (doc, term) in normal operation; MAX (not sum)
        # makes the probe idempotent under the one duplicate-arrival
        # mode the exactly-once ids cannot close — a wiped checkpoint
        # over RE-BUNDLED crawl files re-ingests docs under fresh
        # content ids, and summing would silently double tf
        return probed.groupBy("doc_id", "term").agg(
            F.max("tf").cast("long").alias("tf")
        )

    def probed_files(self, terms: Sequence[str]) -> set[str]:
        """Driver-side audit: which postings files a probe would open
        (tests pin this ≪ all files after optimize())."""
        out: set[str] = set()
        for t in terms:
            out.update(self.postings.pruned_files([("term", "=", t)]))
        return out

    def search(
        self,
        spark: SparkSession,
        terms: Sequence[str],
        topk: int,
    ) -> DataFrame:
        """Top-``topk`` BM25 over the stored corpus for a bag-of-terms
        query.  One probe of the query terms' postings + one doclens
        scan — corpus text is never touched (tests/test_search_index.py
        audits the plan for zero documents-table reads).  Doclens
        dedupe by MAX like the probe (a no-op in normal operation,
        idempotent under wiped-checkpoint re-bundled replays); an
        empty index returns an empty ranking.

        Raw user input (the CLI ``search`` command passes terms
        verbatim) is normalized HERE through the same whitespace
        tokenization the index applied at ingest: multi-word terms
        split, empty strings drop, duplicates dedupe (a duplicated
        term must not double its BM25 contribution).  Matching stays
        verbatim/case-sensitive — exactly what the stored tokens
        are."""
        terms = list(
            dict.fromkeys(
                tok
                for t in terms
                for tok in (t or "").split(" ")
                if tok
            )
        )
        tf = self.probe(spark, terms)
        if self.doclens.latest_version() is None:
            dl = spark.createDataFrame([], "doc_id LONG, dl LONG")
        else:
            dl = (
                self.doclens.read(spark)
                .groupBy("doc_id")
                .agg(F.max("dl").cast("long").alias("dl"))
            )
        return bm25_topk(tf, dl, terms, topk)
