"""Multimodal plumbing tests: codec round-trip, JVM-side header parse,
mapInPandas decode/resize/featurize/frame-sample shapes."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.multimodal import (
    decode_media,
    image_features,
    media_from_documents,
    resize_images,
    sample_frames,
    synthetic_media,
)
from etl_tpch_spark.multimodal.media import decode_payload, encode_payload


def test_codec_roundtrip():
    samples = np.arange(4 * 6 * 3) % 256
    payload = encode_payload(
        "image", samples, height=4, width=6, channels=3
    )
    kind, meta, arr = decode_payload(payload)
    assert kind == "image" and arr.shape == (4, 6, 3)
    assert meta["height"] == 4 and meta["width"] == 6
    np.testing.assert_array_equal(arr.ravel(), samples.astype(np.uint8))


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 60, seed=7).cache()


def test_meta_parsed_jvm_side(spark, media):
    """The meta struct comes from byte-slicing expressions, not Python —
    it must agree with the Python decoder on every row."""
    decoded = decode_media(media, keep_samples=False).select(
        "media_id", "height", "width", "channels"
    )
    jvm = media.select(
        "media_id",
        F.col("meta.height").alias("height"),
        F.col("meta.width").alias("width"),
        F.col("meta.channels").alias("channels"),
    )
    assert decoded.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(decoded).count() == 0


def test_decode_shapes(media):
    pdf = decode_media(media).toPandas()
    assert len(pdf) == 60
    img = pdf[pdf.kind == "image"].iloc[0]
    assert img.n_samples == img.height * img.width * img.channels
    assert len(img.samples) == img.n_samples
    vid = pdf[pdf.kind == "video"]
    assert (vid.n_samples == 16 * 16 * 3 * (vid.n_samples // (16 * 16 * 3))).all()


def test_resize(media):
    out = resize_images(media, height=8, width=8).toPandas()
    assert len(out) == 20  # one third of 60 are images
    assert (out.pixels.map(len) == 8 * 8 * 3).all()
    # identity resize reproduces original pixels
    first = media.filter(media.kind == "image").limit(1)
    h, w = first.select("meta.height", "meta.width").first()
    same = resize_images(first, height=h, width=w).first()
    orig = decode_media(first).first()
    assert same.pixels == orig.samples


def test_image_features(media):
    pdf = image_features(media, bins=16).toPandas()
    assert len(pdf) == 60
    assert ((pdf["mean"] >= 0) & (pdf["mean"] <= 255)).all()
    sums = pdf.feature.map(lambda v: abs(sum(v) - 1.0))
    assert (sums < 1e-5).all()


def test_sample_frames(media):
    frames = sample_frames(media, every_n=2).toPandas()
    metas = decode_media(media, keep_samples=False).toPandas()
    vids = media.filter(media.kind == "video").select(
        "media_id", "meta.n_frames"
    ).toPandas()
    exp = int(np.ceil(vids.n_frames / 2).sum())
    assert len(frames) == exp
    assert (frames.pixels.map(len) == 16 * 16 * 3).all()
    assert set(frames.media_id) == set(vids.media_id)
    assert len(metas) == 60


def test_media_from_documents(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    n = media.count()
    assert n > 0
    # decoded sample count must equal the utf-8 byte length of the text
    got = decode_media(media, keep_samples=False).select(
        "media_id", "n_samples"
    )
    from etl_tpch_spark.catalog import Tables

    exp = Tables(spark, sf_dir).documents.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length("text").cast("long").alias("n_samples"),
    )
    assert got.exceptAll(exp).count() == 0
