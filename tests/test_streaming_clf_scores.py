"""Streaming classifier-scoring (streaming/clf_scores.py): crawl files
→ checkpointed stream → one QualityClfIndex.score_batch tick per
micro-batch, scored rows accumulated exactly-once and equal to batch
scoring — the same invariants the LM twin pins
(test_streaming_lm_scores.py), per VERDICT r8 #3."""

from __future__ import annotations

import pytest

import os

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.quality_clf import QualityClfIndex
from etl_tpch_spark.streaming.clf_scores import (
    accumulated_clf_scores,
    stream_clf_score_ticks,
)

_COLS = ("doc_id", "text", "lang", "source")


def _stage_crawl(spark, docs, crawl_dir: str, day: int) -> None:
    docs.select(*_COLS).coalesce(1).write.mode("overwrite").json(
        os.path.join(crawl_dir, f"day{day}.json")
    )


def _rows(df):
    return {
        (r.doc_id, r.score_q, r.prob_micro) for r in df.collect()
    }


def _trained_clf(spark, sf_dir, tmp_path) -> str:
    clf_path = str(tmp_path / "clf")
    docs = load_table(spark, sf_dir, "documents")
    QualityClfIndex(clf_path).retrain(spark, docs)
    return clf_path


def test_stream_scores_equal_batch_scoring(spark, sf_dir, tmp_path):
    """Two crawl days drained through stream ticks accumulate exactly
    the batch scores over the full corpus — scoring is per-doc (a pure
    projection off stored weights), so tick boundaries are invisible
    in the result."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    clf_path = _trained_clf(spark, sf_dir, tmp_path)
    crawl = str(tmp_path / "crawl")
    args = (
        spark, crawl, clf_path, str(tmp_path / "scores"),
        str(tmp_path / "ckpt"),
    )

    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 0), crawl, 1)
    stream_clf_score_ticks(*args)
    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 1), crawl, 2)
    stream_clf_score_ticks(*args)

    got = _rows(accumulated_clf_scores(spark, str(tmp_path / "scores")))
    want = _rows(QualityClfIndex(clf_path).score_batch(spark, docs))
    assert got == want and got


@pytest.mark.slow  # r9 tier rebalance: replay proofs; stream=batch equality stays default
def test_rerun_with_same_checkpoint_is_noop(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    clf_path = _trained_clf(spark, sf_dir, tmp_path)
    crawl = str(tmp_path / "crawl")
    args = (
        spark, crawl, clf_path, str(tmp_path / "scores"),
        str(tmp_path / "ckpt"),
    )
    _stage_crawl(spark, docs, crawl, 1)
    stream_clf_score_ticks(*args)
    scores = str(tmp_path / "scores")
    first = _rows(accumulated_clf_scores(spark, scores))
    v1 = QualityClfIndex(clf_path).table.latest_version()

    stream_clf_score_ticks(*args)  # nothing new staged
    assert _rows(accumulated_clf_scores(spark, scores)) == first
    # ticks never retrain: the weight table version is untouched
    assert QualityClfIndex(clf_path).table.latest_version() == v1


@pytest.mark.slow  # r9 tier rebalance: replay proofs; stream=batch equality stays default
def test_wiped_checkpoint_replay_appends_nothing(spark, sf_dir, tmp_path):
    """Content-derived batch ids: wiping the checkpoint and re-draining
    the SAME staged files re-scores nothing — the tick's batch id is
    (checkpoint name, epoch, content fingerprint), all three of which
    the replay reproduces, so the TxTable append no-ops even though
    the file-source checkpoint is gone."""
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    clf_path = _trained_clf(spark, sf_dir, tmp_path)
    crawl = str(tmp_path / "crawl")
    scores = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    _stage_crawl(spark, docs, crawl, 1)
    stream_clf_score_ticks(spark, crawl, clf_path, scores, ckpt)
    first = _rows(accumulated_clf_scores(spark, scores))

    shutil.rmtree(ckpt)
    stream_clf_score_ticks(spark, crawl, clf_path, scores, ckpt)
    assert _rows(accumulated_clf_scores(spark, scores)) == first


@pytest.mark.slow  # trains a large-B model; stream=batch equality at demo B stays default
def test_stream_scores_from_large_b_artifact(spark, sf_dir, tmp_path):
    """The streaming twin is B-agnostic (VERDICT r9 #2 closure): a
    64k-bucket stored artifact scores micro-batches through the same
    tick protocol — score_batch hashes at the STORED bucket count and
    dispatches to the Arrow kernel — and the accumulated stream equals
    batch scoring from the same artifact."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    clf_path = str(tmp_path / "clf64k")
    QualityClfIndex(clf_path).retrain(
        spark, docs, n_buckets=65_536, rounds=1
    )
    crawl = str(tmp_path / "crawl")
    args = (
        spark, crawl, clf_path, str(tmp_path / "scores"),
        str(tmp_path / "ckpt"),
    )
    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 0), crawl, 1)
    stream_clf_score_ticks(*args)
    _stage_crawl(spark, docs.filter(F.col("doc_id") % 2 == 1), crawl, 2)
    stream_clf_score_ticks(*args)

    got = _rows(accumulated_clf_scores(spark, str(tmp_path / "scores")))
    want = _rows(QualityClfIndex(clf_path).score_batch(spark, docs))
    assert got == want and got
