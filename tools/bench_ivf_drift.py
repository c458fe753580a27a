"""Measure IVF recall decay across assignment-only ticks under
distribution drift, and the retrain recovery (VERDICT r4 #3).

Builds a seed index from a 4-center gaussian mixture, then ticks
drifted batches (centers the seed training never saw) one at a time,
measuring top-k recall on drifted queries after each tick against a
brute-force ground truth over the accumulated corpus — the curve
SCALING.md publishes, and the empirical basis for the
needs_retrain(max_ticks=10) default wired into pipeline/daily.py.

Usage: python tools/bench_ivf_drift.py [n_ticks] [batch]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.session import get_spark  # noqa: E402
from etl_tpch_spark.similarity.index import IVFIndex  # noqa: E402

DIM = 16
N_SEED = 2000
N_CELLS = 16
TOP_K = 10
N_PROBE = 4

SEED_CENTERS = [
    [1.0 if j == k else 0.0 for j in range(DIM)] for k in range(4)
]
DRIFT_CENTERS = [
    [-1.0 if j in (k, (k + 1) % DIM) else -0.3 for j in range(DIM)]
    for k in range(4)
]


def make_vectors(spark, ids, centers, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in ids:
        c = np.array(centers[i % len(centers)], dtype="float64")
        v = c + rng.normal(0.0, 0.05, DIM)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def recall(idx, spark, queries, truth_set):
    got = {
        (r.query_id, r.vec_id)
        for r in idx.topk(spark, queries, TOP_K, n_probe=N_PROBE).collect()
    }
    return len(got & truth_set) / len(truth_set)


def corpus_truth(corpus, queries, k):
    """Exact corpus-only top-k per query (queries are NOT corpus
    members, so ranking must exclude them — ranking the union would
    let the mutually-near queries crowd corpus rows out of the
    truth)."""
    from pyspark.sql import Window as W

    from etl_tpch_spark.similarity.ann import _pair_cosine, _with_norm

    c = _with_norm(corpus, "vec_id", "c_emb", "c_norm")
    q = _with_norm(queries, "query_id", "q_emb", "q_norm")
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "cosine", _pair_cosine("q_emb", "c_emb", "q_norm", "c_norm")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id")
    )


def main() -> None:
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("bench-ivf-drift")
    queries = make_vectors(
        spark, range(1_000_000, 1_000_032), DRIFT_CENTERS, 999
    ).localCheckpoint()

    with tempfile.TemporaryDirectory() as root:
        seed = make_vectors(spark, range(N_SEED), SEED_CENTERS, 1)
        idx = IVFIndex.build(
            os.path.join(root, "ivf"), seed, n_cells=N_CELLS, iters=1
        )
        union = seed.localCheckpoint()
        nxt = N_SEED
        print("tick,recall_ticked,recall_fresh,cell_skew")
        for t in range(n_ticks + 1):
            truth = corpus_truth(union, queries, TOP_K)
            truth_set = {(r.query_id, r.vec_id) for r in truth.collect()}
            fresh = IVFIndex.build(
                os.path.join(root, f"fresh{t}"),
                union,
                n_cells=N_CELLS,
                iters=1,
            )
            print(
                f"{t},{recall(idx, spark, queries, truth_set):.3f},"
                f"{recall(fresh, spark, queries, truth_set):.3f},"
                f"{idx.cell_skew(spark):.2f}"
            )
            if t == n_ticks:
                break
            nb = make_vectors(
                spark, range(nxt, nxt + batch), DRIFT_CENTERS, 100 + t
            )
            idx.tick(spark, nb, batch_id=f"tick-{t}")
            union = union.unionByName(nb).localCheckpoint()
            nxt += batch
        rebuilt = idx.rebuild(spark)
        print(
            f"rebuild,{recall(rebuilt, spark, queries, truth_set):.3f},"
            f"-,{rebuilt.cell_skew(spark):.2f}"
        )


if __name__ == "__main__":
    main()
