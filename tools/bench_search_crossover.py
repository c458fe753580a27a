"""Measure the indexed-vs-unindexed hybrid-retrieval crossover
(VERDICT r4 #4): search_hybrid_rrf re-derives both channels from the
corpus every run (full tokenize + full embedding scan), while
search_hybrid_rrf_indexed probes persisted indexes — the right shape
at scale, but with a constant factor (driver round-trips + index
snapshot reads) that dominates at toy scale.  This tool times both
steady-state (indexes pre-built, 2nd run reported) at each sf_dir
given, so SCALING.md can publish where the index pays off.

Usage: python tools/bench_search_crossover.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tpch_spark import registry  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

registry.load_all()
REGISTRY = registry.REGISTRY

QUERIES = ("search_hybrid_rrf", "search_hybrid_rrf_indexed")


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark("bench-search-crossover")
    for sf_dir in dirs:
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        print(f"== {sf_dir} ({n_docs} docs)")
        for name in QUERIES:
            fn = REGISTRY[name].fn
            # run 1 warms (and for the indexed form, builds) — run 2
            # is the steady-state number
            for run in (1, 2):
                t0 = time.monotonic()
                n = fn(spark, sf_dir).count()
                dt = time.monotonic() - t0
                if run == 2:
                    print(f"  {name}: {dt:.2f}s ({n} rows)")


if __name__ == "__main__":
    main()
