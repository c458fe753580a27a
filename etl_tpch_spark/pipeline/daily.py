"""The INTEGRATED daily tick: every recurring LLM-pipeline maintenance
job in one cadence call — the composition the per-suite streams
(streaming/{dedup_index,span_index,lm_scores,hll_index}.py) and the
corpus cycle (pipeline/corpus.py) exist to serve, run the way a real
scheduler would run them: once per day over whatever the crawler
staged.

One ``crawl_day_tick`` call per day does:

1. **doc drain** — ONE checkpointed AvailableNow stream over the
   staged crawl files; each micro-batch rides a single content-derived
   batch id through
   - the corpus cycle (MinHash-index dedup tick → quality gate →
     split assignment → exactly-once corpus append; the minhash index
     is ticked exactly once per batch, INSIDE the cycle),
   - a SpanIndex tick (duplicated-span detection vs all prior days),
   - an LmIndex scoring tick (CCNet-style quality scores vs the
     reference LM ingested at setup),
   - a QualityClfIndex scoring tick (the trained model gate from
     stored weights — one feature pass over the batch + one broadcast
     join; enabled when ensure_quality_classifier trained at setup),
   - a SearchIndex ingest (the day's postings + doclens land in the
     inverted index, so lexical/BM25 retrieval sees same-day docs
     without ever re-tokenizing old ones).
   One drain, one checkpoint, one batch id ⇒ the exactly-once story
   is shared: a replayed epoch no-ops in every index at once, and a
   crash BETWEEN stages replays to completion (each stage checks the
   id independently).
2. **event drain** — the HLL index tick stream over staged event
   files (its own checkpoint; different source cadence); and an
   optional **vector drain** — assignment-only IVF ticks over staged
   embedding files (ensure_ann_index trains the centroids once), so
   ANN queries see same-day vectors without a rebuild.
3. **maintenance** — index OPTIMIZE / sketch fold once file counts
   cross their thresholds (small-file accretion is the failure mode
   of daily appends).
4. **export** — deterministic shuffle-shards of the train split
   (pipeline/export.py), the artifact a training run consumes.

Per-tick cost is O(new batch) against every stored index — the
whole-composition claim measured in tools/bench_daily_tick.py and
pinned flat across 3 simulated days at the 10× fixture in
tests/test_daily_tick.py (VERDICT r3 #8).

The reference schedules five Prefect flows on timers
(reference workflow.py:12-39); this is the same architecture with the
LLM-pipeline stage set instead of the TPC-H one (pipeline/workflow.py
run_cycle/serve_loop).
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.spans import SpanIndex
from ..streaming.hll_index import stream_hll_ticks
from ..streaming.lm_scores import SCORED_DOC_SCHEMA
from ..streaming.ticks import stream_doc_ticks
from .corpus import corpus_cycle
from .export import export_shards
from .lm_index import LmIndex
from .search_index import SearchIndex
from .txlog import TxTable


def ensure_reference_lm(
    spark: SparkSession, ref_docs: DataFrame, root_dir: str
) -> None:
    """Ingest the reference LM once (idempotent): the bigram counts the
    daily scoring ticks read.  Re-calling with the same batch id is a
    no-op, so setup can run at every scheduler start.  The ingest is
    folded immediately: scoring reads the stored counts every day, so
    the table should cost its VOCABULARY size (one row per distinct
    bigram), not the reference corpus's pair volume — a 10× reference
    corpus then moves the daily scoring scan by its marginal new-bigram
    count, not 10×."""
    idx = LmIndex(os.path.join(root_dir, "lm"))
    before = idx.table.latest_version()
    idx.ingest(ref_docs, batch_id="lm-reference-v1")
    if idx.table.latest_version() != before:  # first real ingest
        idx.fold(spark)


def ensure_quality_classifier(
    spark: SparkSession, labeled_docs: DataFrame, root_dir: str
) -> None:
    """Train the quality classifier once (idempotent): the in-engine
    hashed-n-gram logistic regression (pipeline/quality_clf.py) over a
    labeled corpus (labels = the in-domain source split), weights
    stored in a TxTable for the daily scoring ticks.  Training is
    deterministic integer arithmetic, so a re-call with the table
    already populated skips; retraining on new labels is an explicit
    ``QualityClfIndex.retrain`` (an overwrite commit — time travel
    keeps the prior model readable)."""
    from .quality_clf import QualityClfIndex

    idx = QualityClfIndex(os.path.join(root_dir, "quality_clf"))
    if idx.table.latest_version() is None:
        idx.retrain(spark, labeled_docs)


def ensure_ann_index(
    spark: SparkSession,
    seed_embeddings: DataFrame,
    root_dir: str,
    *,
    n_cells: int = 16,
) -> None:
    """Build the ANN index once from a seed corpus (idempotent: a
    centroids table already committed means training ran).  Daily
    vector batches then ride :func:`crawl_day_tick`'s
    ``vectors_dir`` drain — assignment-only ticks against these
    stored centroids; retraining is an explicit maintenance rebuild."""
    from ..similarity.index import IVFIndex

    idx = IVFIndex(os.path.join(root_dir, "ivf_index"))
    if idx.cent_t.latest_version() is None:
        IVFIndex.build(idx.path, seed_embeddings, n_cells=n_cells)


def crawl_day_tick(
    spark: SparkSession,
    crawl_dir: str,
    root_dir: str,
    *,
    events_dir: str | None = None,
    vectors_dir: str | None = None,
    threshold: float = 0.5,
    quality_floor: float = 0.2,
    compact_over_files: int = 64,
    retain_versions: int | None = 30,
    export: bool = False,
    n_shards: int = 8,
    delta_export: bool = False,
) -> dict[str, Any]:
    """Run one integrated daily tick; returns a stage → outcome summary
    including per-stage wall seconds (the flatness evidence)."""
    from .quality_clf import QualityClfIndex

    spans_t = TxTable(os.path.join(root_dir, "spans"))
    scores_t = TxTable(os.path.join(root_dir, "scores"))
    span_idx = SpanIndex(os.path.join(root_dir, "span_index"))
    lm_idx = LmIndex(os.path.join(root_dir, "lm"))
    search_idx = SearchIndex(os.path.join(root_dir, "search_index"))
    clf_idx = QualityClfIndex(os.path.join(root_dir, "quality_clf"))
    clf_scores_t = TxTable(os.path.join(root_dir, "clf_scores"))
    # the model gate runs only if setup trained a model — same
    # optionality as the event/vector drains
    clf_enabled = clf_idx.table.latest_version() is not None
    out: dict[str, Any] = {"cycles": []}

    def doc_tick(batch: DataFrame, bid: str) -> None:
        # corpus cycle FIRST (it owns the minhash index tick); span,
        # LM and inverted-index stages then ride the same batch id — a
        # replay after a crash between stages no-ops whatever already
        # landed.  Per-stage wall seconds ride the summary: the
        # flatness evidence names the stage, not just the day.
        s0 = time.monotonic()
        summary = corpus_cycle(
            spark,
            batch,
            root_dir,
            batch_id=bid,
            threshold=threshold,
            quality_floor=quality_floor,
        )
        s1 = time.monotonic()
        spans = span_idx.tick(spark, batch, batch_id=bid)
        spans_t.append(spans, batch_id=bid)
        s2 = time.monotonic()
        scores_t.append(lm_idx.score(spark, batch), batch_id=bid)
        s3 = time.monotonic()
        search_idx.ingest(batch, batch_id=bid)
        s4 = time.monotonic()
        if clf_enabled:
            clf_scores_t.append(
                clf_idx.score_batch(spark, batch), batch_id=bid
            )
        s5 = time.monotonic()
        summary["stage_s"] = {
            "corpus": round(s1 - s0, 3),
            "spans": round(s2 - s1, 3),
            "lm": round(s3 - s2, 3),
            "search": round(s4 - s3, 3),
            "clf": round(s5 - s4, 3),
        }
        out["cycles"].append(summary)

    t0 = time.monotonic()
    stream_doc_ticks(
        spark,
        crawl_dir,
        os.path.join(root_dir, "checkpoints", "docs"),
        doc_tick,
        schema=SCORED_DOC_SCHEMA,
    )
    out["docs_s"] = round(time.monotonic() - t0, 3)

    if events_dir is not None:
        t0 = time.monotonic()
        stream_hll_ticks(
            spark,
            events_dir,
            os.path.join(root_dir, "hll_index"),
            os.path.join(root_dir, "checkpoints", "events"),
            fold_over_files=compact_over_files,
        )
        out["events_s"] = round(time.monotonic() - t0, 3)

    if vectors_dir is not None:
        # ANN freshness: assignment-only IVF ticks against the stored
        # centroids (ensure_ann_index built them once); same
        # exactly-once protocol, own checkpoint (own source cadence)
        from ..streaming.ivf_index import stream_ivf_ticks

        t0 = time.monotonic()
        stream_ivf_ticks(
            spark,
            vectors_dir,
            os.path.join(root_dir, "ivf_index"),
            os.path.join(root_dir, "checkpoints", "vectors"),
            compact_over_files=compact_over_files,
        )
        out["vectors_s"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    from ..dedup.index import MinHashIndex

    corpus = TxTable(os.path.join(root_dir, "corpus"))

    def grown(t: TxTable) -> bool:
        return (
            t.latest_version() is not None
            and len(t.snapshot_files()) > compact_over_files
        )

    minhash_idx = MinHashIndex(os.path.join(root_dir, "dedup_index"))
    if grown(minhash_idx.table):
        minhash_idx.compact(spark)
    if grown(span_idx.table):
        span_idx.compact(spark)
    if grown(lm_idx.table):
        lm_idx.fold(spark)
    if grown(search_idx.postings):
        search_idx.optimize(spark)
    if grown(corpus):
        corpus.compact(spark, target_files=8, cluster_by=("doc_id",))
    # ANN hygiene: assignment-only ticks freeze the centroids, so a
    # drifting corpus decays recall (measured curve: SCALING.md).  The
    # policy gate is cheap (driver-side tick count, then a K-row skew
    # aggregation only if needed); a triggered rebuild retrains from
    # the index's own stored vectors — no corpus re-read
    from ..similarity.index import IVFIndex

    ivf = IVFIndex(os.path.join(root_dir, "ivf_index"))
    if ivf.cent_t.latest_version() is not None and ivf.needs_retrain(
        spark
    ):
        ivf.rebuild(spark)
        out["ivf_retrained"] = True

    # classifier hygiene (the same frozen-model decay story as IVF):
    # scoring ticks never touch the weights, so a drifting crawl
    # hashes new vocabulary into untrained buckets.  The gate is
    # cheap — driver-side short-circuit on <2 score ticks, else one
    # O(new) aggregate over the latest tick's files + one keep-column
    # aggregate — and a triggered retrain runs on the STORED corpus
    # snapshot (labels = source split), an overwrite commit like any
    # rebuild.  A single-class corpus raises loudly (the retrain
    # guard) rather than silently serving a degenerate gate.
    if (
        clf_idx.table.latest_version() is not None
        and corpus.latest_version() is not None
        and clf_idx.needs_retrain(spark, clf_scores_t)
    ):
        clf_idx.retrain(spark, corpus.read(spark))
        out["clf_retrained"] = True

    # retention: without a vacuum cadence every superseded compaction/
    # rebuild keeps its data files forever — at a daily tick rate the
    # stores grow O(days × corpus), not O(corpus).  Keep a fixed
    # time-travel horizon (default 30 versions ≈ a month of dailies)
    # and drop older file generations; vacuum carries the dropped
    # entries' batch ids forward, so whole-day replays after vacuum
    # still no-op (pinned in tests/test_daily_tick.py).  Guarded by
    # version count so no-tick days stay O(1) driver-side.
    stores = [
        corpus,
        spans_t,
        scores_t,
        minhash_idx.table,
        span_idx.table,
        lm_idx.table,
        search_idx.postings,
        search_idx.doclens,
        ivf.cells_t,
        ivf.cent_t,
        clf_idx.table,
        clf_scores_t,
        # folded per-day registers accrete generations like any
        # other store; versions() is [] when no event stream ever
        # ran, so the skip-guards below make this a no-op then
        TxTable(os.path.join(root_dir, "hll_index")),
    ]
    if retain_versions is not None:
        n_freed = 0
        for t in stores:
            if len(t.versions()) > retain_versions:
                n_freed += len(t.vacuum(keep_versions=retain_versions))
        if n_freed:
            out["vacuumed_files"] = n_freed

    # Delta-log mirroring (round 11): every store the tick maintains
    # can expose a real `_delta_log` beside its data files, so any
    # Delta reader follows the lake the cadence maintains.  Per tick
    # the export is O(new commits) — same incremental discipline as
    # every other maintenance stage — and it runs AFTER vacuum so a
    # truncated history exports its retained base, never files a
    # rival just deleted.
    if delta_export:
        from .delta_export import export_delta_log

        exported = {
            os.path.relpath(t.path, root_dir): n
            for t in stores
            if t.versions() and (n := export_delta_log(t))
        }
        if exported:
            out["delta_export"] = exported
    out["maintenance_s"] = round(time.monotonic() - t0, 3)

    if export and corpus.latest_version() is not None:
        t0 = time.monotonic()
        train = corpus.read(spark).filter(F.col("split") == "train")
        out["export"] = export_shards(
            train, os.path.join(root_dir, "export"), ["doc_id"], n_shards
        )
        out["export_s"] = round(time.monotonic() - t0, 3)
    return out


def crawl_serve_loop(
    spark: SparkSession,
    stage_day,
    root_dir: str,
    *,
    days: int,
    export_every: int = 1,
    **tick_kwargs: Any,
) -> list[dict[str, Any]]:
    """Drive ``days`` integrated ticks: per day, call
    ``stage_day(day) -> (crawl_dir, events_dir | None[, vectors_dir])``
    (the caller's crawler/collector), then run :func:`crawl_day_tick`.
    Mirrors pipeline/workflow.py serve_loop's cadence-multiple pattern
    for the export stage.  Returns per-day summaries with wall
    seconds."""
    outs: list[dict[str, Any]] = []
    for day in range(days):
        staged = tuple(stage_day(day)) + (None, None)
        crawl_dir, events_dir, vectors_dir = staged[:3]
        t0 = time.monotonic()
        summary = crawl_day_tick(
            spark,
            crawl_dir,
            root_dir,
            events_dir=events_dir,
            vectors_dir=vectors_dir,
            export=(day % export_every == export_every - 1),
            **tick_kwargs,
        )
        summary["day"] = day
        summary["wall_s"] = round(time.monotonic() - t0, 3)
        outs.append(summary)
    return outs
