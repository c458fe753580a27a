"""Isolate per-query computation cost with the noop sink (guide §1.4).

``bench.py`` times ``fn(...).count()`` — the cross-round comparable
protocol.  ``count()`` lets the optimizer prune columns (and sometimes
whole subtrees), so for queries whose final operator is a projection
the counted plan can be cheaper than the full computation.  This tool
times BOTH actions per query (warm, best-of-N) so the delta is
measurable per query instead of assumed:

    noop: df.write.format("noop").mode("overwrite").save()
          — computes every column of every row, discards the result
    count: df.count() — the bench's timed action

Usage:
    python tools/bench_noop.py [--sf-dir /root/testdata/sf0.1] \
        [--repeat 3] [names...]
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


def _best_of(fn, repeat: int) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("bench-noop")
    qs = registry.load_all()
    names = args.names or list(HEADLINE)
    unknown = sorted(set(names) - set(qs))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    warm_dir = "/root/testdata/sf0.001"
    rows = []
    for name in names:
        fn = qs[name].fn
        try:
            fn(spark, warm_dir).count()  # codegen warmup
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"noop:{name}")
        t_noop = _best_of(
            lambda: fn(spark, args.sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            args.repeat,
        )
        spark.sparkContext.setJobDescription(f"count:{name}")
        t_count = _best_of(
            lambda: fn(spark, args.sf_dir).count(), args.repeat
        )
        spark.sparkContext.setJobDescription(None)
        rows.append(
            {
                "query": name,
                "noop_sec": t_noop,
                "count_sec": t_count,
                "noop_over_count": round(t_noop / max(t_count, 1e-9), 3),
            }
        )
        print(
            f"# {name}: noop {t_noop:.3f}s  count {t_count:.3f}s  "
            f"ratio {rows[-1]['noop_over_count']}",
            file=sys.stderr,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
