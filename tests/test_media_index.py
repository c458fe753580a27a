"""Persisted perceptual-hash index (multimodal/index.py): tick ≡
batch, exactly-once replay, and the decisive scale property — a tick's
pair plan never re-decodes stored media (8-byte signatures are the
stored artifact; decode happens once, at ingest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.multimodal.index import MediaHashIndex
from etl_tpch_spark.multimodal.media import image_media_from_documents
from etl_tpch_spark.multimodal.ops import near_dup_media_pairs

MAX_H = 3


def _media(spark, sf_dir):
    return image_media_from_documents(spark, sf_dir, height=12, width=22)


def _pairs_set(df):
    return {(r.media_a, r.media_b, r.hamming) for r in df.collect()}


def test_indexed_tick_equals_batch_pairs_touching_new(
    spark, sf_dir, tmp_path
):
    media = _media(spark, sf_dir)
    corpus = media.filter(F.col("media_id") % 2 == 0)
    new = media.filter(F.col("media_id") % 2 == 1)
    idx = MediaHashIndex(str(tmp_path / "mh"))
    idx.ingest(corpus, batch_id="day0")
    got = _pairs_set(idx.tick(spark, new, MAX_H, batch_id="day1"))
    want = {
        p
        for p in _pairs_set(near_dup_media_pairs(media, MAX_H))
        if p[0] % 2 == 1 or p[1] % 2 == 1
    }
    assert got == want
    assert got  # fixture has cross-parity near-dups


def test_union_of_ticks_covers_all_non_seed_pairs(spark, sf_dir, tmp_path):
    """Prefix semantics: after ticking batches b1, b2 in order, the
    union of tick outputs is every pair except those internal to the
    seed corpus — the same contract as the MinHash index."""
    media = _media(spark, sf_dir)
    seed = media.filter(F.col("media_id") % 3 == 0)
    b1 = media.filter(F.col("media_id") % 3 == 1)
    b2 = media.filter(F.col("media_id") % 3 == 2)
    idx = MediaHashIndex(str(tmp_path / "mh"))
    idx.ingest(seed, batch_id="seed")
    got = _pairs_set(idx.tick(spark, b1, MAX_H, batch_id="b1"))
    got |= _pairs_set(idx.tick(spark, b2, MAX_H, batch_id="b2"))
    want = {
        p
        for p in _pairs_set(near_dup_media_pairs(media, MAX_H))
        if p[0] % 3 != 0 or p[1] % 3 != 0
    }
    assert got == want


def test_replayed_batch_ingests_nothing(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    idx = MediaHashIndex(str(tmp_path / "mh"))
    idx.ingest(media.filter(F.col("media_id") < 50), batch_id="b")
    n1 = idx.signatures(spark).count()
    idx.ingest(media.filter(F.col("media_id") < 50), batch_id="b")
    assert idx.signatures(spark).count() == n1


def test_pairs_plan_never_decodes_stored_media(spark, sf_dir, tmp_path):
    """The tick's pair query must be media-free: no Python/Arrow stage
    (decode) anywhere in the plan — only the index parquet scan."""
    media = _media(spark, sf_dir)
    idx = MediaHashIndex(str(tmp_path / "mh"))
    idx.ingest(media, batch_id="all")
    new_ids = media.select("media_id").filter(
        F.col("media_id") % 2 == 0
    )
    df = idx.pairs_touching(spark, new_ids, MAX_H)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, marker
    # (the signature frame is lazily checkpointed inside the band
    # kernel, which truncates the rendered lineage — the index scan
    # itself is asserted on the un-checkpointed read)
    sig_plan = idx.signatures(spark)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert str(tmp_path / "mh") in sig_plan
    # and the values it returns match recomputing from media
    got = _pairs_set(df)
    want = {
        p
        for p in _pairs_set(near_dup_media_pairs(media, MAX_H))
        if p[0] % 2 == 0 or p[1] % 2 == 0
    }
    assert got == want


def test_compact_preserves_signatures(spark, sf_dir, tmp_path):
    media = _media(spark, sf_dir)
    idx = MediaHashIndex(str(tmp_path / "mh"))
    for i in range(4):
        idx.ingest(
            media.filter(F.col("media_id") % 4 == i), batch_id=f"b{i}"
        )
    before = {
        (r.media_id, r.dhash) for r in idx.signatures(spark).collect()
    }
    idx.compact(spark, target_files=2)
    after = {
        (r.media_id, r.dhash) for r in idx.signatures(spark).collect()
    }
    assert after == before
