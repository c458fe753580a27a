"""Perceptual (dHash) image near-dup: recall, invariance, banding.

The reference has no media dedup at all (its pipeline is relational —
SURVEY.md §1); this is part of the LLM-training-data extension surface:
text has minhash/simhash/ExactSubstr, images get the gradient-hash
near-dup every curation pipeline runs before training.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.multimodal.media import (
    encode_payload,
    image_media_from_documents,
    MEDIA_SCHEMA,
)
from etl_tpch_spark.multimodal.ops import (
    PHASH_BITS,
    near_dup_media_pairs,
    perceptual_hash,
)


def _media_df(spark, items):
    """items: list of (media_id, 2-D uint8 array)."""
    rows = [
        (
            int(mid),
            "image",
            encode_payload(
                "image",
                arr.ravel(),
                height=arr.shape[0],
                width=arr.shape[1],
                channels=1,
            ),
            None,
        )
        for mid, arr in items
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def base_image():
    rng = np.random.default_rng(7)
    return rng.integers(0, 200, (24, 33)).astype(np.uint8)


def test_banding_equals_bruteforce(spark, sf_dir):
    """Pigeonhole banding is EXACT: the banded join returns precisely
    the brute-force Hamming ≤ 3 pair set on the real fixture corpus."""
    media = image_media_from_documents(spark, sf_dir, height=12, width=22)
    sig = perceptual_hash(media).toPandas()
    h = dict(zip(sig.media_id, sig.dhash))
    ids = sorted(h)
    brute = {
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(h[a] ^ h[b]).count("1") <= 3
    }
    banded = {
        (r.media_a, r.media_b, r.hamming)
        for r in near_dup_media_pairs(media, 3).collect()
    }
    assert banded == brute
    assert len(brute) > 0  # the fixture corpus has perceptual near-dups


def test_brightness_shift_is_near_dup(spark, base_image):
    """dHash is invariant to uniform brightness change (gradient SIGNS
    survive +/- shifts) — the perturbation a re-encode/levels pass
    introduces that byte checksums can't see."""
    brighter = np.clip(base_image.astype(np.int64) + 40, 0, 255).astype(
        np.uint8
    )
    media = _media_df(spark, [(1, base_image), (2, brighter)])
    pairs = near_dup_media_pairs(media, 3).collect()
    assert [(r.media_a, r.media_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_small_noise_within_hamming_budget(spark, base_image):
    """A few flipped pixels flip at most a few gradient bits."""
    noisy = base_image.copy()
    noisy[3, 5] = 255  # one hot pixel in the 24x33 source
    media = _media_df(spark, [(1, base_image), (2, noisy)])
    pairs = near_dup_media_pairs(media, 3).collect()
    assert len(pairs) == 1 and pairs[0].hamming <= 3


def test_unrelated_images_not_paired(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (24, 33)).astype(np.uint8)
    b = rng.integers(0, 256, (24, 33)).astype(np.uint8)
    media = _media_df(spark, [(1, a), (2, b)])
    assert near_dup_media_pairs(media, 3).count() == 0


def test_hash_width_and_range(spark, sf_dir):
    """60-bit keys: non-negative longs (band shiftright stays
    sign-safe), high 4 bits always clear."""
    media = image_media_from_documents(spark, sf_dir, height=12, width=22)
    stats = perceptual_hash(media).agg(
        F.min("dhash").alias("lo"), F.max("dhash").alias("hi")
    ).first()
    assert stats.lo >= 0
    assert stats.hi < (1 << PHASH_BITS)


def test_grayscale_channel_mean(spark):
    """Multi-channel images reduce via exact integer channel mean
    before the gradient — a 3-channel image whose channels are all the
    same plane hashes identically to the 1-channel plane."""
    rng = np.random.default_rng(13)
    plane = rng.integers(0, 256, (12, 22)).astype(np.uint8)
    rgb = np.repeat(plane[:, :, None], 3, axis=2)
    rows = [
        (
            1,
            "image",
            encode_payload(
                "image", plane.ravel(), height=12, width=22, channels=1
            ),
            None,
        ),
        (
            2,
            "image",
            encode_payload(
                "image", rgb.ravel(), height=12, width=22, channels=3
            ),
            None,
        ),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.dhash for r in perceptual_hash(media).collect()}
    assert got[1] == got[2]


# ------------------------------- audio envelope fingerprint ----------


def _audio_df(spark, items):
    """items: list of (media_id, 1-D uint8 array)."""
    rows = [
        (
            int(mid),
            "audio",
            encode_payload("audio", arr, sample_rate=16000),
            None,
        )
        for mid, arr in items
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_audio_gain_shift_is_near_dup(spark):
    """Uniform gain change preserves envelope-gradient signs — the
    re-encode/normalization perturbation byte checksums can't see."""
    from etl_tpch_spark.multimodal.ops import near_dup_audio_pairs

    rng = np.random.default_rng(17)
    base = rng.integers(0, 200, 4000).astype(np.uint8)
    louder = (base.astype(np.int64) + 30).clip(0, 255).astype(np.uint8)
    media = _audio_df(spark, [(1, base), (2, louder)])
    pairs = near_dup_audio_pairs(media, 3).collect()
    assert [(r.media_a, r.media_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_audio_localized_noise_within_budget(spark):
    """A short corrupted burst touches few spans → few bits flip."""
    from etl_tpch_spark.multimodal.ops import near_dup_audio_pairs

    rng = np.random.default_rng(19)
    base = rng.integers(0, 256, 4000).astype(np.uint8)
    noisy = base.copy()
    noisy[100:140] = 255  # one 40-sample burst inside one ~65-sample span
    media = _audio_df(spark, [(1, base), (2, noisy)])
    pairs = near_dup_audio_pairs(media, 3).collect()
    assert len(pairs) == 1 and pairs[0].hamming <= 3


def test_audio_unrelated_clips_not_paired(spark):
    from etl_tpch_spark.multimodal.ops import near_dup_audio_pairs

    rng = np.random.default_rng(23)
    a = rng.integers(0, 256, 4000).astype(np.uint8)
    b = rng.integers(0, 256, 4000).astype(np.uint8)
    media = _audio_df(spark, [(1, a), (2, b)])
    assert near_dup_audio_pairs(media, 3).count() == 0


def test_audio_short_clips_excluded(spark):
    """Clips under 61 samples have no 1-sample-wide span — excluded,
    mirroring the oracle's length filter."""
    from etl_tpch_spark.multimodal.ops import audio_fingerprint

    rng = np.random.default_rng(29)
    media = _audio_df(
        spark,
        [(1, rng.integers(0, 256, 60).astype(np.uint8)),
         (2, rng.integers(0, 256, 61).astype(np.uint8))],
    )
    got = [r.media_id for r in audio_fingerprint(media).collect()]
    assert got == [2]


# ------------------------------- video frame fingerprints ------------


def _video_df(spark, items, h=6, w=11):
    """items: list of (media_id, 3-D uint8 array (frames, h, w))."""
    rows = [
        (
            int(mid),
            "video",
            encode_payload(
                "video",
                arr.ravel(),
                height=h,
                width=w,
                channels=1,
                n_frames=arr.shape[0],
            ),
            None,
        )
        for mid, arr in items
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_video_shared_frames_pair(spark):
    """Two clips sharing >=2 (gain-shifted) frames pair; the shift
    proves per-frame fingerprints are perceptual, not byte checksums."""
    from etl_tpch_spark.multimodal.ops import near_dup_video_pairs

    rng = np.random.default_rng(31)
    frames = rng.integers(0, 200, (4, 6, 11)).astype(np.uint8)
    other = rng.integers(0, 200, (4, 6, 11)).astype(np.uint8)
    v2 = frames.copy()
    v2[:2] = np.clip(frames[:2].astype(np.int64) + 25, 0, 255)  # gain
    v2[2:] = other[2:]  # rest differs
    media = _video_df(spark, [(1, frames), (2, v2)])
    pairs = near_dup_video_pairs(media, min_frames=2).collect()
    assert [(r.media_a, r.media_b, r.n_frames_matched) for r in pairs] == [
        (1, 2, 2)
    ]


def test_video_single_shared_frame_below_threshold(spark):
    from etl_tpch_spark.multimodal.ops import near_dup_video_pairs

    rng = np.random.default_rng(37)
    a = rng.integers(0, 256, (4, 6, 11)).astype(np.uint8)
    b = rng.integers(0, 256, (4, 6, 11)).astype(np.uint8)
    b[0] = a[0]
    media = _video_df(spark, [(1, a), (2, b)])
    assert near_dup_video_pairs(media, min_frames=2).count() == 0


def test_video_blank_frames_do_not_match(spark):
    """Constant (padding/letterbox) frames are masked: two clips whose
    only common content is blank frames never pair."""
    from etl_tpch_spark.multimodal.ops import near_dup_video_pairs

    rng = np.random.default_rng(41)
    a = rng.integers(0, 256, (4, 6, 11)).astype(np.uint8)
    b = rng.integers(0, 256, (4, 6, 11)).astype(np.uint8)
    a[2:] = 0  # blank tails
    b[2:] = 0
    media = _video_df(spark, [(1, a), (2, b)])
    assert near_dup_video_pairs(media, min_frames=2).count() == 0


def test_video_native_resolution_frames_downscale_not_overflow(spark):
    """Review r7: frames larger than the fingerprint grid must
    downscale (identity on 6x11), not pack h*(w-1) native bits into a
    long — synthetic 16x16 frames previously overflowed int64."""
    from etl_tpch_spark.multimodal.ops import video_frame_hashes

    rng = np.random.default_rng(43)
    big = rng.integers(0, 256, (4, 16, 16)).astype(np.uint8)
    media = _video_df(spark, [(1, big)], h=16, w=16)
    got = video_frame_hashes(media).collect()
    assert len(got) == 4
    assert all(0 <= r.fhash < (1 << 60) for r in got)


def test_audio_segments_over_long_width_rejected(spark):
    from etl_tpch_spark.multimodal.ops import audio_fingerprint

    media = _audio_df(
        spark, [(1, np.zeros(200, dtype=np.uint8))]
    )
    with pytest.raises(ValueError):
        audio_fingerprint(media, segments=66)
