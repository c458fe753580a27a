"""Measure TxTable stats-based data skipping (pipeline/txlog.py
read_where) against the full-scan filter on the same table.

Protocol: load sf0.1 lineitem into a TxTable, OPTIMIZE with
``cluster_by=(l_shipdate,)`` into N range-disjoint files, then run a
one-week shipdate query both ways: ``read(...).where(pred)`` (Spark
opens every file; parquet row-group stats still skip WITHIN files)
vs ``read_where(...)`` (the manifest prunes files driver-side before
Spark opens anything).  Reports files opened + best-of-3 wall time.

Usage:  python tools/bench_skipping.py [sf_dir] [n_files]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import load_table  # noqa: E402
from etl_tpch_spark.pipeline.txlog import TxTable  # noqa: E402
from etl_tpch_spark.session import get_spark  # noqa: E402


def best_of(fn, n=3):
    out = []
    for _ in range(n):
        s = time.time()
        fn()
        out.append(time.time() - s)
    return min(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bench-skipping")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_shipdate",
    )
    with tempfile.TemporaryDirectory() as d:
        t = TxTable(os.path.join(d, "li"))
        t.append(li)
        t.compact(spark, target_files=n_files, cluster_by=("l_shipdate",))
        lo, hi = li.agg(F.min("l_shipdate"), F.max("l_shipdate")).first()
        mid = lo + (hi - lo) / 2
        week = (mid, mid + dt.timedelta(days=7))
        preds = [("l_shipdate", ">=", week[0]), ("l_shipdate", "<", week[1])]

        def full():
            return (
                t.read(spark)
                .where(
                    (F.col("l_shipdate") >= F.lit(week[0]))
                    & (F.col("l_shipdate") < F.lit(week[1]))
                )
                .agg(F.sum("l_quantity"))
                .collect()
            )

        def skipped():
            return (
                t.read_where(spark, preds)
                .agg(F.sum("l_quantity"))
                .collect()
            )

        full(), skipped()  # warm
        rows_full = full()[0][0]
        rows_skip = skipped()[0][0]
        assert rows_full == rows_skip, (rows_full, rows_skip)
        opened = len(t.pruned_files(preds))
        print(
            f"table: {li.count()} rows in {n_files} range-clustered files; "
            f"one-week predicate"
        )
        print(
            f"full scan : {n_files} files opened, "
            f"{best_of(full):.3f} s"
        )
        print(
            f"read_where: {opened} files opened, "
            f"{best_of(skipped):.3f} s"
        )


if __name__ == "__main__":
    main()
