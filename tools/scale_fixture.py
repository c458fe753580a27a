"""Build an N×-scaled copy of the driver testdata for stress runs.

The driver provides sf ≤ 0.1; to measure how plans behave when data
actually dominates (SCALING.md), replicate each table ``factor`` times
with deterministic re-keying — facts get globally-unique keys that
preserve join relationships (orders and lineitem re-key with the SAME
formula, so every lineitem still finds its order); documents get one
extra per-copy token so copies are near- but not exact-duplicates
(exercises the dedup cascade the way a real crawl corpus would).

Usage:
    python tools/scale_fixture.py [factor] [src_sf_dir] [out_dir]
    SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part")
REKEY = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_dir(src: str, out: str, factor: int) -> None:
    spark = get_spark("scale-fixture")
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        df = load_table(spark, src, name)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    for name, keys in REKEY.items():
        df = load_table(spark, src, name).select("*", copies)
        for k in keys:
            df = df.withColumn(k, F.col(k) * factor + F.col("__copy"))
        if name == "documents":
            # near-dup copies: one trailing token differs per copy
            df = df.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" c"),
                         F.col("__copy").cast("string")),
            )
        df.drop("__copy").write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: ×{factor}")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scaled_x{factor}"
    scale_dir(src, out, factor)
