"""Cold-session pass over the headline queries (VERDICT r7 #8).

bench.py measures the warm steady state (per-query best-of-N after an
sf0.001 warmup pass — the number that scales with data).  This tool
measures the OTHER end of the lifecycle: ONE fresh Python+JVM process,
NO warmup, each headline query timed on its first invocation in
registry order.  First-invocation cost bundles whole-stage-codegen JIT
and the cold open of every persisted artifact (kmeans fits, LM counts,
ANN/media/span indexes) — exactly what the r6 artifact-promotion work
made cheap, and what a daily restarted pipeline actually pays.

Prints the same one-line JSON shape as bench.py with
metric=headline_queries_cold_first_invocation.

Usage: python tools/bench_cold.py   (env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("etl_tpch_spark-bench-cold")

    all_queries = registry.load_all()
    missing = sorted(set(HEADLINE) - set(all_queries))
    if missing:
        # no-silent-truncation convention (ADVICE r8): a renamed or
        # unregistered headline query must not quietly vanish from the
        # cold-bench total.
        raise SystemExit(
            f"bench_cold: headline queries missing from registry: {missing}"
        )
    names = list(HEADLINE)
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = all_queries[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_cold_first_invocation",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
