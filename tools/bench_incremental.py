"""Daily-crawl tick cost: stateless vs persisted-index incremental
dedup, across corpus scales (VERDICT r2 #8 — the scaling evidence for
the O(new)-per-tick claim).

Protocol per (sf_dir, corpus scale): a FIXED-size new batch (~500
docs, the daily crawl) against a corpus that grows with the fixture —
the axis that separates O(new) from O(corpus) tick cost.  The
STATELESS path re-signs corpus ∪ new every tick
(operators.minhash_lsh_pairs_incremental).  The INDEXED path
pre-ingests the corpus signatures into a MinHashIndex TxTable
(yesterday's state — not timed), then a tick signs ONLY the new batch
and joins the stored index (index.tick).  Both report wall-clock of
one tick; identical pair outputs are asserted, not assumed.

Usage:
    python tools/bench_incremental.py [sf_dir ...]
    # default: /root/testdata/sf0.1 /tmp/sf1 (the 10x stress fixture)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.dedup.index import MinHashIndex  # noqa: E402
from etl_tpch_spark.dedup.operators import (  # noqa: E402
    minhash_lsh_pairs_incremental,
)
from etl_tpch_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.5


TARGET_NEW = 500


def bench_dir(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    k = max(2, round(docs.count() / TARGET_NEW))
    corpus = docs.filter(F.col("doc_id") % k != 0)
    new = docs.filter(F.col("doc_id") % k == 0)
    n_corpus, n_new = corpus.count(), new.count()

    t0 = time.monotonic()
    stateless_pairs = minhash_lsh_pairs_incremental(
        corpus, new, THRESHOLD
    ).count()
    stateless_s = time.monotonic() - t0

    idx_dir = tempfile.mkdtemp(prefix="minhash-idx-bench-")
    try:
        idx = MinHashIndex(idx_dir)
        idx.ingest(corpus, batch_id="corpus")  # yesterday's state
        t0 = time.monotonic()
        indexed_pairs = idx.tick(
            spark, new, THRESHOLD, batch_id="tick"
        ).count()
        indexed_s = time.monotonic() - t0
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    assert stateless_pairs == indexed_pairs, (
        sf_dir, stateless_pairs, indexed_pairs,
    )
    return {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_new": n_new,
        "pairs": indexed_pairs,
        "stateless_tick_s": round(stateless_s, 2),
        "indexed_tick_s": round(indexed_s, 2),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    spark = get_spark("bench-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [bench_dir(spark, d) for d in dirs if os.path.isdir(d)]
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
