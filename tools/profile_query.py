"""Profile a registry query via the Spark event log (guide §7.1 — the
UI is disabled in this sandbox, so this recovers the same job/stage
truth from SparkListener events): per-job wall, per-stage task counts
and times, and the DRIVER GAPS between jobs (planning / AQE
re-optimization / py4j round-trips), which the stage view alone hides.

Usage:
    python tools/profile_query.py <query> [--sf-dir D] [--reps 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

EV_DIR = "/tmp/spark-events-profile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.makedirs(EV_DIR, exist_ok=True)
    for old in glob.glob(EV_DIR + "/*"):
        if os.path.isfile(old):
            os.unlink(old)

    from etl_tpch_spark import registry
    from etl_tpch_spark.session import get_spark

    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EV_DIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    fn = registry.load_all()[args.query].fn
    try:
        fn(spark, "/root/testdata/sf0.001").count()  # warm codegen
    except Exception as exc:
        print(f"# warmup failed: {exc}", file=sys.stderr)
    best, best_i = None, -1
    for i in range(args.reps):
        spark.sparkContext.setJobDescription(f"TIMED#{i} {args.query}")
        t0 = time.perf_counter()
        n = fn(spark, args.sf_dir).count()
        dt = time.perf_counter() - t0
        print(f"rep{i}: {dt:.3f}s ({n} rows)")
        if best is None or dt < best:
            best, best_i = dt, i
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    fs = [p for p in glob.glob(EV_DIR + "/*") if os.path.isfile(p)]
    f = max(fs, key=os.path.getmtime)
    jobs, stages = {}, {}
    for line in open(f):
        e = json.loads(line)
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": e.get("Properties", {}).get(
                    "spark.job.description", ""
                ),
                "start": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e["Stage Infos"]],
            }
        elif t == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "tasks": si["Number of Tasks"],
                "ms": si.get("Completion Time", 0)
                - si.get("Submission Time", 0),
            }
    tag = f"TIMED#{best_i}"
    prev_end = None
    tot_job = tot_gap = 0.0
    print(f"--- jobs of best rep ({tag}, {best:.3f}s wall) ---")
    for jid, j in sorted(jobs.items()):
        if tag not in j["desc"]:
            prev_end = j.get("end", prev_end)
            continue
        dur = (j.get("end", 0) - j["start"]) / 1000
        gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
        prev_end = j.get("end", 0)
        tot_job += dur
        tot_gap += max(gap, 0)
        print(f"job {jid}: {dur:6.3f}s (gap {gap:6.3f}s)")
        for s in sorted(j["stages"]):
            if s in stages:
                st = stages[s]
                print(
                    f"    stage {s}: {st['ms']/1000:6.3f}s "
                    f"tasks={st['tasks']:3d} {st['name']}"
                )
    print(
        f"--- jobs {tot_job:.3f}s + gaps(driver) {tot_gap:.3f}s "
        f"of {best:.3f}s wall ---"
    )


if __name__ == "__main__":
    main()
