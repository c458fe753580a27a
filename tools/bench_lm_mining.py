"""Scale evidence for the LM-filter / negative-mining surface.

Measures (SCALING.md rows):
1. query wall time at sf0.1 and at the 10×-replicated fixture for
   text_lm_quality_filter and sim_contrastive_negatives;
2. the O(new) scoring-tick claim: scoring a FIXED 500-doc batch
   against a stored LM trained on the sf0.1 reference slice vs one
   trained on the 10× reference slice — tick cost should track the
   batch (and the vocab-sized LM join), not the reference corpus.

Usage:  python tools/bench_lm_mining.py [sf_dir] [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.pipeline.lm_index import LmIndex  # noqa: E402
from etl_tpch_spark.queries.similarity import contrastive_negs  # noqa: E402
from etl_tpch_spark.queries.text import (  # noqa: E402
    _LM_REF_SOURCE,
    text_lm_quality_filter,
)
from etl_tpch_spark.session import get_spark  # noqa: E402


def timed(label: str, fn) -> None:
    t0 = time.monotonic()
    n = fn()
    print(f"{label}: {time.monotonic() - t0:.2f} s ({n} rows)")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_spark("bench-lm-mining")

    for d in (sf, sf10):
        tag = os.path.basename(os.path.normpath(d))
        timed(
            f"text_lm_quality_filter @{tag}",
            lambda d=d: text_lm_quality_filter(spark, d).count(),
        )
        timed(
            f"sim_contrastive_negatives @{tag}",
            lambda d=d: contrastive_negs(spark, d).count(),
        )

    # fixed new-batch scoring tick vs reference-corpus size
    batch = load_table(spark, sf, "documents").limit(500).cache()
    batch.count()
    for d in (sf, sf10):
        tag = os.path.basename(os.path.normpath(d))
        ref = load_table(spark, d, "documents").filter(
            F.col("source") == _LM_REF_SOURCE
        )
        path = tempfile.mkdtemp(prefix=f"lmbench-{tag}-") + "/lm"
        t0 = time.monotonic()
        LmIndex(path).ingest(ref, batch_id="ref")
        train_s = time.monotonic() - t0
        idx = LmIndex(path)
        t0 = time.monotonic()
        n = idx.score(spark, batch).count()
        print(
            f"lm tick (500-doc batch) @{tag}: train {train_s:.2f} s, "
            f"score {time.monotonic() - t0:.2f} s ({n} rows)"
        )
    batch.unpersist()


if __name__ == "__main__":
    main()
