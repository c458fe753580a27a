"""One-call pipeline cycle — the engine-side equivalent of the
reference's Prefect deployment set (workflow.py:12-39).

The reference schedules five flows at fixed intervals (generate 15 min,
ingest 15 min, compact 6 h, reduce 24 h, dashboard 5 min).  Scheduling
belongs to the caller's orchestrator (cron/Airflow/Prefect — all can
call a Python function); what the engine owes is the *stage graph* with
correct ordering and idempotence.  ``run_cycle`` executes one tick of
every stage; per-stage booleans reproduce the differing cadences
(e.g. ``compact=`` every 24th call ≙ 6 h vs 15 min).

The streaming variant of ingest (exactly-once, no consume-and-delete)
is used when a checkpoint dir is supplied; otherwise the batch path
mirrors the reference's delete-after-write.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import SparkSession

from .compact import compact_all
from .generate import incrementalize
from .ingest import ingest_all
from .reduce import query_reduce


def run_cycle(
    spark: SparkSession,
    source_dir: str,
    root_dir: str,
    *,
    now: datetime,
    generate: bool = True,
    ingest: bool = True,
    compact: bool = False,
    reduce: bool = False,
    checkpoint: bool = True,
    quality_gate: bool = False,
    key_fn: str = "hash",
    k: int = 50,
) -> dict[str, Any]:
    """Run one micro-batch tick over the medallion zones rooted at
    ``root_dir`` (staging/ processed/ results/ checkpoints/).  Returns a
    stage → outcome summary."""
    staging = os.path.join(root_dir, "staging")
    processed = os.path.join(root_dir, "processed")
    results = os.path.join(root_dir, "results")
    out: dict[str, Any] = {}

    if generate:
        out["generate"] = incrementalize(
            spark, source_dir, staging, now=now, key_fn=key_fn
        )
    if ingest:
        if checkpoint:
            from ..streaming.ingest import stream_ingest_all

            qmap = stream_ingest_all(
                spark,
                staging,
                processed,
                os.path.join(root_dir, "checkpoints"),
            )
            out["ingest"] = sorted(qmap)
        else:
            out["ingest"] = ingest_all(
                spark, staging, processed, delete_after=True
            )
    if quality_gate:
        # post-ingest expectations on the dynamic tables (DLT-style:
        # a failed expectation is reported, the caller decides policy)
        from .quality import check_not_null, check_unique, run_expectations

        orders_path = os.path.join(processed, "orders")
        if os.path.exists(orders_path):
            odf = spark.read.parquet(orders_path)
            report = run_expectations(
                [
                    check_not_null(odf, "o_orderkey"),
                    check_not_null(odf, "o_custkey"),
                    check_unique(odf, "o_orderkey"),
                ]
            ).collect()
            out["quality"] = {
                r.check_name: (r.n_violations, r.passed) for r in report
            }
    if compact:
        out["compact"] = compact_all(spark, processed)
    if reduce:
        out["reduce"] = query_reduce(
            spark, processed, results, cutoff=now, k=k
        )
    return out


def serve_loop(
    spark: SparkSession,
    source_dir: str,
    root_dir: str,
    *,
    ticks: int,
    interval_s: float = 0.0,
    compact_every: int = 24,
    reduce_every: int = 96,
    now_fn=None,
    **cycle_kwargs: Any,
) -> list[dict[str, Any]]:
    """Interval scheduling daemon — the engine-side twin of the
    reference's five Prefect deployments on timers (workflow.py:12-39).

    Runs ``ticks`` cycles, sleeping ``interval_s`` between them (one
    tick ≙ the reference's 15-min generate/ingest cadence).  The slower
    cadences fire on tick multiples exactly like the reference's
    schedule ratios: compact every 24 ticks (6 h / 15 min) and reduce
    every 96 ticks (24 h / 15 min), both also on the first tick so a
    fresh lake reaches a served state immediately.  Returns the
    per-tick stage summaries.  ``ticks`` bounds the loop (pass a large
    value for an effectively-unattended daemon; cron re-invocation is
    the crash-resilient production form — every stage is idempotent)."""
    import time

    now_fn = now_fn or (
        lambda: datetime.now(timezone.utc).replace(tzinfo=None)
    )
    outs: list[dict[str, Any]] = []
    for tick in range(ticks):
        out = run_cycle(
            spark,
            source_dir,
            root_dir,
            now=now_fn(),
            compact=tick % compact_every == 0,
            reduce=tick % reduce_every == 0,
            **cycle_kwargs,
        )
        out["tick"] = tick
        out["ready"] = results_ready(os.path.join(root_dir, "results"))
        outs.append(out)
        if interval_s and tick + 1 < ticks:
            time.sleep(interval_s)
    return outs


def results_ready(
    results_dir: str,
    segments: tuple[str, ...] = (
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
    ),
) -> bool:
    """Health check ≙ the reference's dashboard flow (dashboard.py:24-32
    waits until all 5 segment result files exist): True once every
    segment's gold parquet is present and non-empty."""
    for seg in segments:
        path = os.path.join(results_dir, f"{seg.lower()}.snappy.parquet")
        if not os.path.isdir(path):
            return False
        if not any(f.endswith(".parquet") for f in os.listdir(path)):
            return False
    return True
