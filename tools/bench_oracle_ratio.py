"""Spark-vs-DuckDB wall-time ratio for the headline queries.

BASELINE.md records that the reference publishes no benchmark numbers,
so the only quantitative gate ("within 2x of baseline at the same
scale factor") needs a measurable stand-in.  DuckDB executing the
oracle SQL on the same parquet at the same scale factor is the
strongest available single-node baseline: a state-of-the-art vectorized
OLAP engine running the semantically identical query on identical
bytes.  This tool times both engines (warm, best-of-N) and emits a
markdown ratio table for SCALING.md.

Usage:  python tools/bench_oracle_ratio.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import HEADLINE  # noqa: E402
from etl_tpch_spark import registry  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _best_of(fn, repeat: int) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--names",
        default=None,
        help="comma-separated explicit query list (overrides --all)",
    )
    ap.add_argument(
        "--all",
        action="store_true",
        help="run the FULL registry (every oracled query), not just "
        "the headline set — the once-per-round regression sweep "
        "(VERDICT r3 #7); any non-headline family regression trips "
        "a number here",
    )
    ap.add_argument(
        "--include-baselines",
        action="store_true",
        help="with --all, also time queries tagged `baseline-only` "
        "(documented-slow recall yardsticks whose product twins carry "
        "the perf gate — skipped from sweeps by default, VERDICT r9 "
        "#8; correctness harnesses always run them).",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="also write the FULL per-query ratio table as a JSON "
        "artifact (VERDICT r11 #8: the whole-registry ratio should be "
        "judge-reproducible from a committed file, the same way "
        "bench.py's JSON line is).  Carries per-query spark/duckdb "
        "walls, cold first-call walls, the pre/post box-drift probes "
        "(bench.py's fixed anchors) and drift-normalized totals.",
    )
    ap.add_argument(
        "--sink",
        choices=("count", "noop"),
        default="count",
        help="Spark-side execution sink.  `count` is the series "
        "protocol (every BENCH_r/sweep number), but the optimizer "
        "prunes pure-Catalyst projections under count(*), so "
        "projection-only rows measure scan+count — while the DuckDB "
        "side always fetchall()s.  `noop` writes to the noop "
        "datasource (full evaluation, no driver transfer) to "
        "quantify that asymmetry (SCALING.md 'count-sink "
        "asymmetry'); do NOT mix sinks within one comparison series.",
    )
    args = ap.parse_args()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        # driver testdata ships single files; scaled fixtures
        # (tools/scale_fixture.py) are Spark-written directories
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )

    spark = get_spark("etl_tpch_spark-ratio")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from bench import (
        DUCKDB_PROBE_ANCHOR_SEC,
        SPARK_PROBE_ANCHOR_SEC,
        _duckdb_probe,
        _spark_probe,
    )

    probe_pre = _spark_probe(spark)
    duck_pre = _duckdb_probe()

    # Queries whose DUCKDB oracle is intractable at sf0.1 — the
    # documented O(n²) bruteforce baseline whose unrolled
    # pairs+recursive-CTE replica runs >12 min single-engine at 10k
    # vectors (hash-checked at sf0.01, the driver's correctness scale,
    # where it completes in seconds).  The --all sweep still times the
    # SPARK side so a Spark regression trips a number; the ratio cell
    # is reported as n/a.
    SPARK_ONLY_AT_SCALE = {"dedup_embedding_clusters_bruteforce"}

    qs = registry.load_all()
    if args.names:
        names = [
            n for n in args.names.split(",") if n in qs and qs[n].oracle
        ]
    elif args.all:
        names = [n for n, q in qs.items() if q.oracle]
        if not args.include_baselines:
            # `baseline-only` rows are documented-slow recall
            # yardsticks (e.g. the exact all-pairs quantized-cosine
            # baseline, ~19 s at sf0.1), not regression surfaces —
            # their product twins carry the perf gate.  Never drop
            # silently: name what was skipped.
            skipped = [
                n for n in names if "baseline-only" in qs[n].tags
            ]
            if skipped:
                names = [n for n in names if n not in set(skipped)]
                print(
                    "skipping baseline-only rows (re-include with "
                    f"--include-baselines): {skipped}",
                    file=sys.stderr,
                )
    else:
        names = [n for n in HEADLINE if n in qs and qs[n].oracle]

    if args.sink == "noop":
        def run_spark(fn):
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    else:
        def run_spark(fn):
            fn(spark, args.sf_dir).count()

    rows = []
    for name in names:
        q = qs[name]
        # Warm until the wall stabilizes, up to 3 passes (VERDICT r10
        # #7): the persisted-index queries pay a scratch-index build +
        # probe-cache fill on their first calls, and ONE warm pass
        # before a --repeat 1 timing left that cost inside the timed
        # row (search_hybrid_rrf_indexed read 8 s in a sweep vs 2.3 s
        # in the fully-warmed bench).  The first-call wall is kept and
        # REPORTED as cold_s whenever it exceeds 2x the warm best —
        # the build cost stays visible instead of silently hidden
        # (the no-silent-caps convention), but the ratio reflects
        # query cost, matching the bench's warm-run protocol.
        warm_walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_spark(q.fn)
            warm_walls.append(time.perf_counter() - t0)
            if len(warm_walls) >= 2 and warm_walls[-2] < 2 * warm_walls[-1]:
                break
        s = _best_of(lambda: run_spark(q.fn), args.repeat)
        cold = warm_walls[0] if warm_walls[0] > 2 * s else None
        cold_txt = f"  (cold first call {cold:.3f}s)" if cold else ""
        if name in SPARK_ONLY_AT_SCALE:
            rows.append((name, s, cold, None, None))
            print(
                f"{name:32s} spark {s:7.3f}s  duckdb     n/a  "
                f"(oracle intractable at this sf){cold_txt}",
                file=sys.stderr,
            )
            continue
        con.execute(q.oracle).fetchall()  # warm duckdb
        d = _best_of(lambda: con.execute(q.oracle).fetchall(), args.repeat)
        rows.append((name, s, cold, d, s / d if d > 0 else float("inf")))
        print(
            f"{name:32s} spark {s:7.3f}s  duckdb {d:7.3f}s  "
            f"ratio {s / d:6.2f}x{cold_txt}",
            file=sys.stderr,
        )

    ratioed = [r for r in rows if r[3] is not None]
    total_s = sum(r[1] for r in ratioed)
    total_d = sum(r[3] for r in ratioed)
    print("\n| query | spark s | cold s | duckdb s | spark/duckdb |")
    print("|---|---|---|---|---|")
    for name, s, cold, d, r in rows:
        cold_cell = f"{cold:.3f}" if cold else ""
        if d is None:
            print(f"| {name} | {s:.3f} | {cold_cell} | n/a | n/a |")
        else:
            print(
                f"| {name} | {s:.3f} | {cold_cell} | {d:.3f} | {r:.2f}x |"
            )
    print(
        f"| **total ({len(ratioed)} ratioed queries)** | **{total_s:.2f}** | "
        f" | **{total_d:.2f}** | **{total_s / total_d:.2f}x** |"
    )
    probe_post = _spark_probe(spark)
    duck_post = _duckdb_probe()
    drift = round(min(probe_pre, probe_post) / SPARK_PROBE_ANCHOR_SEC, 4)
    duck_drift = (
        round(min(duck_pre, duck_post) / DUCKDB_PROBE_ANCHOR_SEC, 4)
        if duck_pre == duck_pre
        else None
    )
    summary = {
        "sf_dir": args.sf_dir,
        "total_spark_s": round(total_s, 3),
        "total_duckdb_s": round(total_d, 3),
        "ratio": round(total_s / total_d, 3),
        "calibration": {
            "spark_probe_pre_sec": probe_pre,
            "spark_probe_post_sec": probe_post,
            "spark_probe_anchor_sec": SPARK_PROBE_ANCHOR_SEC,
            "duckdb_probe_pre_sec": duck_pre,
            "duckdb_probe_post_sec": duck_post,
            "duckdb_probe_anchor_sec": DUCKDB_PROBE_ANCHOR_SEC,
            "drift": drift,
            "duckdb_drift": duck_drift,
        },
        # drift-normalized totals: both engines' walls divided by
        # their own probe drift, so the ratio of a run on a slow box
        # phase stays comparable across sessions
        "total_spark_s_normalized": round(total_s / drift, 3),
        "total_duckdb_s_normalized": (
            round(total_d / duck_drift, 3) if duck_drift else None
        ),
        "ratio_normalized": (
            round((total_s / drift) / (total_d / duck_drift), 3)
            if duck_drift
            else None
        ),
    }
    print(json.dumps(summary))
    if args.out:
        artifact = dict(summary)
        artifact.update(
            {
                "sink": args.sink,
                "repeat": args.repeat,
                "n_ratioed": len(ratioed),
                "n_spark_only": len(rows) - len(ratioed),
                "per_query": {
                    name: {
                        "spark_s": round(s, 4),
                        "cold_s": round(cold, 4) if cold else None,
                        "duckdb_s": round(d, 4) if d is not None else None,
                        "ratio": round(r, 4) if r is not None else None,
                    }
                    for name, s, cold, d, r in rows
                },
            }
        )
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
