"""Classifier quality evidence across training rounds AND bucket
counts (VERDICT r8 #8; B axis added in round 10 alongside the
B-parameterized artifact).

The demo trains K = CLF_ROUNDS = 4 rounds at B = CLF_BUCKETS = 1024.
This tool evidences both knobs: train at each (K, B) on a given SF,
score the corpus with each weight vector AT ITS OWN B, and report
precision / recall of the keep gate (score_q >= 0) against the
in-domain label, plus the class-mean separation margin.  Results →
SCALING.md "Classifier quality at the keep floor" (K axis, round 9)
and "Classifier gate quality along the bucket axis" (B axis, round
10); the sf0.1 separation/precision floors are pinned by
tests/test_quality_clf.py::test_separation_and_gate_quality_sf01.

Usage: python tools/bench_clf_quality.py [--sf-dir DIR] [--ks 4,8,16]
                                         [--bs 1024,65536]
Prints one JSON line per (K, B).
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
    CLF_REF_SOURCE,
    class_counts,
    doc_features,
    score_with_weights_auto,
    train_logreg,
    training_frame,
)
from etl_tpch_spark.session import get_spark  # noqa: E402


def gate_quality(spark, docs, w, n_buckets=None) -> dict:
    """precision/recall of keep = (score_q >= 0) vs the in-domain
    label, plus per-class mean margins — one aggregate over the
    scored corpus.  Features hash at the model's own bucket count
    (len(w) - 1), exactly as the persisted artifact scores."""
    n_buckets = len(w) - 1 if n_buckets is None else n_buckets
    scored = score_with_weights_auto(doc_features(docs, n_buckets), w).join(
        docs.select(
            "doc_id",
            (F.col("source") == CLF_REF_SOURCE).alias("is_pos"),
        ),
        "doc_id",
    )
    r = scored.agg(
        F.sum(F.when(F.col("is_pos") & (F.col("score_q") >= 0), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_pos") & (F.col("score_q") >= 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_pos") & (F.col("score_q") < 0), 1).otherwise(0)).alias("fn"),
        F.avg(F.when(F.col("is_pos"), F.col("score_q"))).alias("pos_mean"),
        F.avg(F.when(~F.col("is_pos"), F.col("score_q"))).alias("neg_mean"),
    ).first()
    tp, fp, fn = int(r["tp"]), int(r["fp"]), int(r["fn"])
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        "recall": round(tp / (tp + fn), 4) if tp + fn else None,
        "pos_mean_score": round(float(r["pos_mean"]), 1),
        "neg_mean_score": round(float(r["neg_mean"]), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--ks", default="4,8,16")
    ap.add_argument("--bs", default=None, help="bucket counts (default: CLF_BUCKETS)")
    args = ap.parse_args()

    from etl_tpch_spark.pipeline.quality_clf import CLF_BUCKETS

    spark = get_spark("etl_tpch_spark-bench-clf-quality")
    docs = Tables(spark, args.sf_dir).documents
    bs = (
        [int(x) for x in args.bs.split(",")]
        if args.bs
        else [CLF_BUCKETS]
    )
    for b in bs:
        feat_lab = training_frame(docs, n_buckets=b)
        n_pos, n_neg = class_counts(feat_lab)
        for k in [int(x) for x in args.ks.split(",")]:
            t0 = time.perf_counter()
            w = train_logreg(
                spark, feat_lab, n_pos, n_neg, rounds=k, n_buckets=b
            )
            train_s = time.perf_counter() - t0
            out = {
                "rounds": k,
                "buckets": b,
                "train_sec": round(train_s, 2),
            }
            out.update(gate_quality(spark, docs, w))
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
