"""MaxScore early termination vs the unpruned indexed BM25 at 1× /
10× / 100× stored-corpus growth — the follow-up to SCALING.md's 100×
table, whose one corpus-dependent query cost (scoring work
O(|postings of query terms|)) search_pruned exists to cut.

Protocol matches tools/bench_ticks_100x.py: seed-ingest + optimize
the corpus (untimed yesterday-state), then time the 3-term registered
query terms (one rare + two common — the stopword shape) through
search() and search_pruned(), best-of-3 warm, and assert the results
are identical rows.

Usage: python tools/bench_maxscore.py [sf_dir ...]
       (default /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.pipeline.search_index import SearchIndex  # noqa: E402
from etl_tpch_spark.queries.text import _BM25_TERMS, _BM25_TOPK  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402


def bench_dir(spark, sf_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    root = tempfile.mkdtemp(prefix="maxscore-")
    try:
        idx = SearchIndex(os.path.join(root, "si"))
        idx.ingest(docs, batch_id="seed")
        idx.optimize(spark)
        plan = idx.maxscore_plan(spark, _BM25_TERMS, _BM25_TOPK)
        times = {}
        for name, fn in (
            ("unpruned", idx.search),
            ("pruned", idx.search_pruned),
        ):
            best, rows = None, None
            for _ in range(3):
                t0 = time.monotonic()
                rows = [
                    tuple(r)
                    for r in fn(spark, _BM25_TERMS, _BM25_TOPK).collect()
                ]
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name] = (best, rows)
        (tu, ru), (tp, rp) = times["unpruned"], times["pruned"]
        assert ru == rp, f"pruned != unpruned at {sf_dir}"
        # structural metric: postings rows entering the weight/pivot
        # stage — the corpus-growing quantity the pruning removes
        # (wall at this fixture is dominated by fixed job overhead)
        from pyspark.sql import functions as F

        tf = idx.probe(spark, plan["essential"] + plan["nonessential"])
        full_rows = tf.count()
        cand = (
            tf.filter(F.col("term").isin(*plan["essential"]))
            .select("doc_id")
            .distinct()
        )
        restricted_rows = tf.join(
            F.broadcast(cand), "doc_id", "left_semi"
        ).count()
        print(
            f"{sf_dir}: docs={n} unpruned={tu:.2f}s pruned={tp:.2f}s "
            f"({tu / tp:.2f}x) pivot_rows={full_rows}->{restricted_rows} "
            f"({full_rows / max(restricted_rows, 1):.1f}x cut) "
            f"nonessential={plan['nonessential']} "
            f"theta={plan['theta']:.3f}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/sf1",
        "/tmp/sf10",
    ]
    spark = get_spark("bench-maxscore")
    for d in dirs:
        if os.path.isdir(d):
            bench_dir(spark, d)
        else:
            print(f"{d}: missing (tools/scale_fixture.py)", file=sys.stderr)


if __name__ == "__main__":
    main()
