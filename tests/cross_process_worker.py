"""Rival writer for the cross-process TxTable race tests — a separate
OS process with its OWN SparkSession/JVM (the real deployment shape:
two Spark applications sharing one table).  Not a test module.

argv: table_path n_batches go_file tag
waits for go_file (unless "-"), then appends n_batches 10-row batches
with batch ids "{tag}-{j}"; prints WORKER_DONE <final_version>.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    path, n_batches, go_file, tag = sys.argv[1:5]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"txrace-{tag}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.leafNodeDefaultParallelism", "1")
        .config("spark.driver.memory", "1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_tpch_spark.pipeline.txlog import TxTable

    t = TxTable(path)
    deadline = time.time() + 180
    while (
        go_file != "-"
        and not os.path.exists(go_file)
        and time.time() < deadline
    ):
        time.sleep(0.05)
    for j in range(int(n_batches)):
        df = spark.createDataFrame(
            [(i, int(tag.strip("w") or 0)) for i in range(10)],
            "id long, v long",
        )
        t.append(df, batch_id=f"{tag}-{j}")
    print("WORKER_DONE", t.latest_version(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
