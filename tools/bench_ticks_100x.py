"""Index-family tick cost at 100× stored-corpus growth (VERDICT r4
#7): the flatness story previously topped out at 11–18×; this tool
runs the MinHashIndex and SearchIndex daily ticks against stored
corpora built from sf0.1 (5k docs), 10× (50k) and 100× (500k docs),
with the SAME fixed-size monotone-id new batch (the daily-crawl
protocol: a day's ids sit above everything stored).

Per fixture: seed-ingest the corpus (yesterday's state — reported but
not the claim), then time one 500-doc tick (minhash: sign + band join
+ verify; search: tokenize + postings/doclens append) and one 3-term
BM25 search.  O(new) means the tick columns stay flat down the table
while the corpus column grows 100×.

Usage: python tools/bench_ticks_100x.py [sf_dir ...]
       (default /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10 — build the
       scaled dirs with tools/scale_fixture.py 10|100)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.dedup.index import MinHashIndex  # noqa: E402
from etl_tpch_spark.pipeline.search_index import SearchIndex  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.5
BATCH = 500
SEARCH_TERMS = ["data", "model", "quality"]


def bench_dir(spark, sf_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    top = docs.agg(F.max("doc_id")).first()[0]
    batch = (
        docs.orderBy("doc_id")
        .limit(BATCH)
        .withColumn("doc_id", (F.col("doc_id") + top + 1).cast("long"))
        .localCheckpoint()
    )
    root = tempfile.mkdtemp(prefix="ticks100x-")
    try:
        mh = MinHashIndex(os.path.join(root, "mh"))
        t0 = time.monotonic()
        mh.ingest(docs, batch_id="seed")
        mh_seed = time.monotonic() - t0
        # two ticks; the second is the steady-state number (first
        # carries plan/codegen warmup)
        for i in (1, 2):
            b = batch.withColumn(
                "doc_id", F.col("doc_id") + i * 10_000_000
            )
            t0 = time.monotonic()
            pairs = mh.tick(
                spark, b, THRESHOLD, batch_id=f"t{i}"
            ).count()
            mh_tick = time.monotonic() - t0

        si = SearchIndex(os.path.join(root, "si"))
        t0 = time.monotonic()
        si.ingest(docs, batch_id="seed")
        si.optimize(spark)
        si_seed = time.monotonic() - t0
        for i in (1, 2):
            b = batch.withColumn(
                "doc_id", F.col("doc_id") + i * 10_000_000
            )
            t0 = time.monotonic()
            si.ingest(b, batch_id=f"t{i}")
            si_tick = time.monotonic() - t0
        t0 = time.monotonic()
        si.search(spark, SEARCH_TERMS, 10).count()
        si_search = time.monotonic() - t0
        print(
            f"{sf_dir}: corpus={n} | minhash seed={mh_seed:.1f}s "
            f"tick={mh_tick:.2f}s (pairs={pairs}) | "
            f"search seed={si_seed:.1f}s tick={si_tick:.2f}s "
            f"bm25={si_search:.2f}s"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/sf1",
        "/tmp/sf10",
    ]
    spark = get_spark("bench-ticks-100x")
    for d in dirs:
        bench_dir(spark, d)


if __name__ == "__main__":
    main()
