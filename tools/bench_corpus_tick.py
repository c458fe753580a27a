"""Measure the LLM-corpus daily tick (pipeline/corpus.py) as corpus
and batch scale.

Protocol: build a corpus of C docs (tick 1), then time a FIXED-size
new-batch tick against it (tick 2, ids shifted above the corpus) at
two corpus scales — the tick-cost-vs-corpus-growth curve for the full
composition (dedup index + quality + splits + txlog append), the same
question tools/bench_incremental.py answers for the dedup stage alone.

Usage:  python tools/bench_corpus_tick.py [sf_dir] [big_sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.pipeline.corpus import corpus_cycle  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

BATCH = 500  # fixed new-batch size


def one_run(spark, docs, label: str) -> None:
    n = docs.count()
    top = docs.agg(F.max("doc_id")).first()[0]
    batch = (
        docs.orderBy("doc_id")
        .limit(BATCH)
        .withColumn("doc_id", (F.col("doc_id") + top + 1).cast("long"))
    )
    with tempfile.TemporaryDirectory() as root:
        s = time.time()
        corpus_cycle(spark, docs, root, batch_id="day-1")
        build_s = time.time() - s
        s = time.time()
        out = corpus_cycle(spark, batch, root, batch_id="day-2")
        tick_s = time.time() - s
        print(
            f"{label}: corpus={n} build={build_s:.2f}s | "
            f"fixed {BATCH}-doc tick={tick_s:.2f}s "
            f"(dup_dropped={out['n_dup_dropped']}, "
            f"appended={out['n_appended']})"
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_spark("bench-corpus-tick")
    one_run(spark, load_table(spark, sf_dir, "documents"), "sf0.1")
    if os.path.isdir(big):
        one_run(spark, load_table(spark, big, "documents"), "10x")


if __name__ == "__main__":
    main()
