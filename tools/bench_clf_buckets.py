"""Classifier bucket-count scale axis (VERDICT r8 #2).

The demo gate runs B = 1024 hashed feature buckets; a production
fastText-style quality gate runs 10⁵–10⁶.  The fold-form scoring plan
embeds the (B+1)-element weight vector as a PLAN LITERAL — free of
joins and shuffles, but its expression construction + analysis +
codegen cost grows with B, and somewhere on the axis it overtakes the
broadcast-join form (weights as a (B+1)-row table, explode + join +
per-doc sum — flat in B).  This tool measures both, plus training,
at B ∈ {1k, 16k, 256k} and asserts fold≡join output equality at every
measured B.  Results → SCALING.md "Classifier bucket-count scale
axis"; the crossover pins CLF_FOLD_MAX_BUCKETS
(pipeline/quality_clf.py).

Usage: python tools/bench_clf_buckets.py [--sf-dir DIR] [--bs 1024,16384,262144]
Prints one JSON line per B.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from etl_tpch_spark.catalog import Tables  # noqa: E402
from etl_tpch_spark.pipeline.quality_clf import (  # noqa: E402
    CLF_ROUNDS,
    class_counts,
    doc_features,
    score_with_weights,
    score_with_weights_arrow,
    score_with_weights_join,
    train_logreg,
    training_frame,
    weights_frame,
)
from etl_tpch_spark.session import get_spark  # noqa: E402


def _fingerprint(df) -> tuple[int, int]:
    """(row count, order-free xor-ish checksum) over (doc_id, score_q,
    prob_micro) — collapses the full result to two longs so the
    fold/join equality check never collects a corpus."""
    row = df.select(
        F.xxhash64(
            F.col("doc_id"), F.col("score_q"), F.col("prob_micro")
        ).alias("x")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(x)").alias("h"),  # xor: order-free, no overflow
    ).first()
    return int(row["n"]), int(row["h"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--bs", default="1024,16384,262144")
    args = ap.parse_args()

    spark = get_spark("etl_tpch_spark-bench-clf-buckets")
    t = Tables(spark, args.sf_dir)

    for n_buckets in [int(b) for b in args.bs.split(",")]:
        t0 = time.perf_counter()
        feat_lab = training_frame(t.documents, n_buckets=n_buckets)
        n_pos, n_neg = class_counts(feat_lab)
        w = train_logreg(
            spark, feat_lab, n_pos, n_neg, CLF_ROUNDS, n_buckets=n_buckets
        )
        train_s = time.perf_counter() - t0

        feat = doc_features(t.documents, n_buckets=n_buckets)

        t0 = time.perf_counter()
        fp_fold = _fingerprint(score_with_weights(feat, w))
        fold_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        fp_join = _fingerprint(
            score_with_weights_join(feat, weights_frame(spark, w))
        )
        join_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        fp_arrow = _fingerprint(score_with_weights_arrow(feat, w))
        arrow_s = time.perf_counter() - t0

        assert fp_fold == fp_join == fp_arrow, (
            f"plan mismatch at B={n_buckets}: "
            f"{fp_fold} / {fp_join} / {fp_arrow}"
        )
        print(
            json.dumps(
                {
                    "n_buckets": n_buckets,
                    "train_sec": round(train_s, 3),
                    "score_fold_sec": round(fold_s, 3),
                    "score_join_sec": round(join_s, 3),
                    "score_arrow_sec": round(arrow_s, 3),
                    "nonzero_weights": sum(1 for x in w if x),
                    "rows": fp_fold[0],
                    "equal": True,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
