"""Measure the INTEGRATED daily tick (pipeline/daily.py) at corpus
scale: build a big corpus on day 0, then run 3 fixed-size simulated
crawl days (+ event days) through crawl_serve_loop and report per-day
wall — the whole-composition flatness curve (VERDICT r3 #8), extending
bench_corpus_tick.py (corpus cycle alone) to corpus + span + LM + HLL
+ export in one cadence run.

Usage:  python tools/bench_daily_tick.py [sf_dir] [batch_docs] [days]
        (default /tmp/sf1 — build with tools/scale_fixture.py 10)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.pipeline.daily import (  # noqa: E402
    crawl_serve_loop,
    ensure_quality_classifier,
    ensure_reference_lm,
)
from etl_tpch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench-daily-tick")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    n, top = docs.count(), docs.agg(F.max("doc_id")).first()[0]
    ev_top = events.agg(F.max("event_id")).first()[0]

    with tempfile.TemporaryDirectory() as root:
        ensure_reference_lm(
            spark, docs.filter(F.col("doc_id") % 97 == 0), root
        )
        # round 10: the cadence gained classifier scoring + the drift
        # gate in r9 — train the gate at setup so the flatness curve
        # measures the FULL current stage list (clf_enabled=True)
        ensure_quality_classifier(spark, docs, root)
        crawl = os.path.join(root, "crawlstage")
        evst = os.path.join(root, "eventstage")

        def stage_day(day: int):
            cd = os.path.join(crawl, f"d{day}")
            ed = os.path.join(evst, f"d{day}")
            if day == 0:  # corpus build: the whole big fixture
                batch_docs = docs
                batch_events = events
            else:  # fixed-size new days, ids above everything prior
                shift = top + 1 + (day - 1) * batch
                batch_docs = (
                    docs.orderBy("doc_id")
                    .limit(batch)
                    .withColumn(
                        "doc_id", (F.col("doc_id") + shift).cast("long")
                    )
                )
                e_shift = ev_top + 1 + (day - 1) * batch * 10
                batch_events = (
                    events.orderBy("event_id")
                    .limit(batch * 10)
                    .withColumn(
                        "event_id",
                        (F.col("event_id") + e_shift).cast("long"),
                    )
                )
            batch_docs.select(
                "doc_id", "text", "lang", "source"
            ).coalesce(4).write.mode("overwrite").json(cd)
            batch_events.select(
                "event_id", "ts", "user_id"
            ).coalesce(4).write.mode("overwrite").json(ed)
            return cd, ed

        outs = crawl_serve_loop(
            spark, stage_day, root, days=days + 1, export_every=1
        )
        print(f"corpus={n} docs, fixed new-day batch={batch}")
        for o in outs:
            label = "build" if o["day"] == 0 else f"day {o['day']}"
            stages = {
                k: o[k]
                for k in ("docs_s", "events_s", "maintenance_s", "export_s")
                if k in o
            }
            print(f"{label}: wall={o['wall_s']:.2f}s {stages}")
            for c in o.get("cycles", []):
                if "stage_s" in c:
                    print(f"    doc stages: {c['stage_s']}")


if __name__ == "__main__":
    main()
