"""Cell-decomposed cosine pair kernels under corpus duplication:
distinct-vector (set-level) scoring vs row-level scoring.

Replicates the sf0.1 embeddings table ``factor`` times as EXACT copies
(re-keyed ids, vectors unchanged — what exact document copies do to an
embedding column) and times both paths of the float and int8 cell
kernels.  Row-level does O(Σg²) kernel work per g-sized copy group
inside every cell block; set-level scores one representative per
distinct vector and expands id pairs afterwards (output-bound).

Usage: python tools/bench_cosine_dup.py [factor ...]   (default: 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402
from etl_tpch_spark.similarity.ann import (  # noqa: E402
    cosine_pairs_threshold_cells,
    quantized_cosine_pairs_cells,
)

THRESHOLD = 0.8
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def duplicated(emb, factor: int):
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("c")
    return emb.select("vec_id", "embedding", copies).select(
        (F.col("vec_id") * factor + F.col("c")).alias("vec_id"),
        "embedding",
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [20]
    spark = get_spark("bench-cosine-dup")
    base = load_table(spark, SF_DIR, "embeddings")
    print(f"base vectors: {base.count()} ({SF_DIR})")
    for factor in factors:
        emb = duplicated(base, factor).localCheckpoint()
        n = emb.count()
        for name, fn in (
            ("float-cells", cosine_pairs_threshold_cells),
            ("int8-cells", quantized_cosine_pairs_cells),
        ):
            t0 = time.monotonic()
            set_n = fn(emb, THRESHOLD).count()
            set_t = time.monotonic() - t0
            t0 = time.monotonic()
            row_n = fn(emb, THRESHOLD, dedup_vectors=False).count()
            row_t = time.monotonic() - t0
            assert set_n == row_n, (set_n, row_n)
            print(
                f"factor {factor:4d}  vecs {n:8d}  {name:12s}  "
                f"pairs {set_n:10d}  set {set_t:7.1f}s  row {row_t:7.1f}s  "
                f"speedup {row_t / set_t:5.2f}x"
            )


if __name__ == "__main__":
    main()
