"""MinHash-LSH band join under corpus duplication (round 7): set-level
vs the row-level form it replaced, vs the DuckDB oracle.

A crawl corpus is duplication-heavy by construction — the dominant
class is byte-identical copies (mirrors, reposts, boilerplate pages).
This tool replicates the sf0.1 documents table ``factor`` times as
EXACT copies (re-keyed ids, text unchanged — the adversarial case for
row-level banding: every g-sized copy group puts g rows into each of
its 8 band buckets, so the candidate distinct shuffles O(Σg²) rows)
and times:

  1. set-level  — the shipped minhash_lsh_pairs (group by shingle
     array, band + verify once per distinct set, expand),
  2. row-level  — the pre-rewrite form (band every row),
  3. DuckDB     — the registered oracle (row-level semantics,
     single-node vectorized), optional via --oracle.

Usage: python tools/bench_minhash_dup.py [factor ...] [--oracle]
       (default factors: 10 50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.dedup.operators import (  # noqa: E402
    _banded_signatures,
    _verify_jaccard,
)
from etl_tpch_spark.dedup.operators import minhash_lsh_pairs  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rowlevel_pairs(docs, threshold):
    """The pre-round-7 row-level form (see tests/test_minhash_setlevel
    for the equivalence pin)."""
    sig = _banded_signatures(docs, storage_level=None).localCheckpoint(
        eager=False
    )
    banded = sig.select("doc_id", F.explode("bands").alias("band"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), "band")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _verify_jaccard(cand, sig, threshold)


def duplicated(docs, factor: int):
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("c")
    return docs.select("doc_id", "text", copies).select(
        (F.col("doc_id") * factor + F.col("c")).alias("doc_id"), "text"
    )


def duckdb_oracle(parquet_path: str) -> tuple[float, int]:
    import duckdb

    from etl_tpch_spark import registry

    sql = registry.load_all()["dedup_minhash_lsh"].oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{parquet_path}/*.parquet')"
    )
    t0 = time.monotonic()
    n = len(con.execute(sql).fetchall())
    return time.monotonic() - t0, n


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factors = [int(a) for a in args] or [10, 50]
    want_oracle = "--oracle" in sys.argv
    spark = get_spark("bench-minhash-dup")
    base = load_table(spark, SF_DIR, "documents")
    print(f"base docs: {base.count()} ({SF_DIR})")
    for factor in factors:
        docs = duplicated(base, factor).localCheckpoint()
        n = docs.count()
        t0 = time.monotonic()
        set_pairs = minhash_lsh_pairs(docs, THRESHOLD).count()
        set_t = time.monotonic() - t0
        t0 = time.monotonic()
        row_pairs = rowlevel_pairs(docs, THRESHOLD).count()
        row_t = time.monotonic() - t0
        line = (
            f"factor {factor:4d}  docs {n:8d}  pairs {set_pairs:10d}  "
            f"set-level {set_t:7.1f}s  row-level {row_t:7.1f}s"
        )
        assert set_pairs == row_pairs, (set_pairs, row_pairs)
        if want_oracle:
            out = f"/tmp/minhash_dup_{factor}"
            docs.write.mode("overwrite").parquet(out)
            o_t, o_n = duckdb_oracle(out)
            assert o_n == set_pairs, (o_n, set_pairs)
            line += f"  duckdb {o_t:7.1f}s  ratio {set_t / o_t:5.2f}x"
        print(line)


if __name__ == "__main__":
    main()
