"""Multimodal transforms: decode / resize / featurize / frame-sample.

Every operator is ``mapInPandas`` over the media schema — the pattern
for any "Python kernel over binary columns" stage at 100 TB:

- Arrow ships each partition to Python as an iterator of pandas
  batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
  batch memory — decoded media is much larger than its payload, so
  batches must stay small: set ~256 for 1 MB payloads);
- the transform yields batches too, so peak memory is one batch, not
  one partition;
- output schemas are explicit StructTypes — Catalyst sees real columns
  and can prune/filter downstream;
- partition-level parallelism is Spark's: repartition upstream to
  spread decode cost; no driver involvement.

Real codecs: `_decode_payload` tries PIL first for images — absent in
this container, so the RAWM stand-in (media.py) decodes instead; the
Spark-side plumbing is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media import decode_payload

_f = T.StructField

try:  # real image codec if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_payload(content: bytes) -> tuple[str, dict, np.ndarray]:
    # PIL path would be: Image.open(io.BytesIO(content)) → np.asarray
    # for JPEG/PNG payloads; RAWM payloads always use the stand-in.
    return decode_payload(content)


DECODED_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("kind", T.StringType()),
        _f("height", T.IntegerType()),
        _f("width", T.IntegerType()),
        _f("channels", T.IntegerType()),
        _f("n_samples", T.LongType()),
        _f("samples", T.ArrayType(T.IntegerType())),
    ]
)


def decode_media(media: DataFrame, *, keep_samples: bool = True) -> DataFrame:
    """binary content → decoded sample array + shape columns."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                k, meta, arr = _decode_payload(bytes(content))
                rows.append(
                    (
                        mid,
                        k,
                        meta["height"],
                        meta["width"],
                        meta["channels"],
                        arr.size,
                        arr.ravel().tolist() if keep_samples else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(fn, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("height", T.IntegerType()),
        _f("width", T.IntegerType()),
        _f("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def resize_images(media: DataFrame, *, height: int, width: int) -> DataFrame:
    """Nearest-neighbor resize to (height, width); images only.

    The kind filter stays a Catalyst filter (pushed to the scan);
    only matching rows cross the Arrow boundary."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, meta, arr = _decode_payload(bytes(content))
                h, w = meta["height"], meta["width"]
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                out = arr[np.ix_(yi, xi)]  # (height, width, c)
                rows.append((mid, height, width, out.ravel().tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.filter(media.kind == "image").mapInPandas(fn, RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("kind", T.StringType()),
        _f("mean", T.DoubleType()),
        _f("std", T.DoubleType()),
        _f("p50", T.DoubleType()),
        _f("feature", T.ArrayType(T.FloatType())),
    ]
)


def image_features(media: DataFrame, *, bins: int = 16) -> DataFrame:
    """Per-item summary stats + a normalized byte-histogram feature
    vector (the shape a CLIP/wav2vec embedding UDF would produce; the
    kernel is the only thing to swap)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                _, _, arr = _decode_payload(bytes(content))
                flat = arr.ravel().astype(np.int64)
                n = max(flat.size, 1)
                # mean/std from exact integer moments (Σx, Σx² are exact
                # int64 for uint8 samples) with a FIXED op sequence —
                # one float division, one sqrt — so any engine computing
                # the same moments gets bit-identical values (numpy's
                # two-pass pairwise-summation std would drift vs a SQL
                # oracle; integer moments cannot)
                sx = int(flat.sum())
                sx2 = int((flat * flat).sum())
                mean = float(sx) / n
                std = float(
                    np.sqrt(float(sx2 * n - sx * sx) / float(n * n))
                )
                hist = np.histogram(
                    flat, bins=bins, range=(0, 256)
                )[0]
                feat = (hist / n).astype(np.float32)
                rows.append(
                    (
                        mid,
                        kind,
                        round(mean, 6),
                        round(std, 6),
                        float(np.median(flat)),
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("dhash", T.LongType()),
    ]
)

PHASH_DST_H = 6
PHASH_DST_W = 11
PHASH_BITS = PHASH_DST_H * (PHASH_DST_W - 1)  # 60 — band-compatible


def perceptual_hash(
    media: DataFrame, *, dst_h: int = PHASH_DST_H, dst_w: int = PHASH_DST_W
) -> DataFrame:
    """Per-image dHash: decode → grayscale → nearest-neighbor downscale
    to (dst_h, dst_w) → horizontal-gradient bits packed into one long.

    Runs inside the same Arrow decode pass as every other media kernel
    (one mapInPandas stage; only the 8-byte key leaves Python).  The
    default 6×11 grid gives 6·10 = 60 gradient bits — deliberately the
    SimHash width, so the pigeonhole band join
    (dedup/operators.py banded_hamming_pairs) applies unchanged:
    4×15-bit bands at max_hamming 3, 32k buckets per band.

    Every step is integer-exact (channel mean = sum // c; downscale
    reads source index r·src//dst, the resize_images map; bit b set
    iff px[r][c+1] > px[r][c], b = r·(dst_w−1)+c row-major), so the
    hash is deterministic across engines/partitionings and a SQL
    oracle rebuilds it bit-for-bit from the source bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, meta, arr = _decode_payload(bytes(content))
                h, w = meta["height"], meta["width"]
                c = max(meta["channels"], 1)
                gray = (
                    arr.reshape(h, w, c).astype(np.int64).sum(axis=2) // c
                )
                yi = np.arange(dst_h) * h // dst_h
                xi = np.arange(dst_w) * w // dst_w
                small = gray[np.ix_(yi, xi)]
                bits = (small[:, 1:] > small[:, :-1]).ravel()
                key = 0
                for b in np.flatnonzero(bits):
                    key |= 1 << int(b)
                ids.append(mid)
                keys.append(key)
            yield pd.DataFrame({"media_id": ids, "dhash": keys})

    return media.filter(media.kind == "image").mapInPandas(fn, PHASH_SCHEMA)


def near_dup_media_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    *,
    dst_h: int = PHASH_DST_H,
    dst_w: int = PHASH_DST_W,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash signatures →
    pigeonhole band join → exact Hamming verify.  The missing dedup
    modality beside text's minhash/simhash/ExactSubstr: byte-level
    checksums catch only EXACT media copies; the gradient hash is
    invariant to the perturbations re-encodes introduce (uniform
    brightness shifts, small value noise that preserves gradient
    signs), so re-encoded copies land within a few bits.

    Recall is exact w.r.t. the hash (banding loses no pair ≤
    max_hamming — pinned vs the brute-force twin in
    tests/test_multimodal_neardup.py), and the join is sub-quadratic:
    one band shuffle, ~n/2^15 rows per bucket at any corpus scale.
    Returns (media_a, media_b, hamming)."""
    from ..dedup.operators import banded_hamming_pairs

    sig = perceptual_hash(media, dst_h=dst_h, dst_w=dst_w)
    return banded_hamming_pairs(
        sig,
        max_hamming,
        id_col="media_id",
        sig_col="dhash",
        bits=dst_h * (dst_w - 1),
    ).select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )


VFRAME_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("frame_idx", T.IntegerType()),
        _f("fhash", T.LongType()),
    ]
)


def video_frame_hashes(
    media: DataFrame, *, dst_h: int = PHASH_DST_H, dst_w: int = PHASH_DST_W
) -> DataFrame:
    """Per-frame perceptual fingerprints for video: decode → grayscale
    each frame → nearest-neighbor downscale to (dst_h, dst_w) →
    horizontal-gradient bits packed into one long per frame (the image
    dHash applied frame-wise; the default 6×11 grid gives 60 bits —
    the downscale is the identity when frames already match the grid,
    and keeps native-resolution frames from overflowing the 63 bits a
    signed long can hold).

    One Arrow pass, one output row per frame — the temporal flat-map
    shape of sample_frames with an 8-byte payload instead of pixels."""
    if dst_h * (dst_w - 1) > 63:
        raise ValueError("frame fingerprint exceeds 63 bits")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, keys = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, meta, arr = _decode_payload(bytes(content))
                c = max(meta["channels"], 1)
                h, w = meta["height"], meta["width"]
                yi = np.arange(dst_h) * h // dst_h
                xi = np.arange(dst_w) * w // dst_w
                for i in range(meta["n_frames"]):
                    gray = (
                        arr[i]
                        .reshape(h, w, c)
                        .astype(np.int64)
                        .sum(axis=2)
                        // c
                    )
                    small = gray[np.ix_(yi, xi)]
                    bits = (small[:, 1:] > small[:, :-1]).ravel()
                    key = 0
                    for b in np.flatnonzero(bits):
                        key |= 1 << int(b)
                    ids.append(mid)
                    fidx.append(i)
                    keys.append(key)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": fidx, "fhash": keys}
            )

    return media.filter(media.kind == "video").mapInPandas(
        fn, VFRAME_SCHEMA
    )


def near_dup_video_pairs(media: DataFrame, min_frames: int = 2) -> DataFrame:
    """Video near-duplicate pairs: two videos match when at least
    ``min_frames`` temporally-aligned frames carry IDENTICAL
    perceptual fingerprints — the production shape for video dedup
    (robust per-frame hashes + exact hash equality): the gradient
    hash already absorbs the per-frame perturbations (gain shifts,
    small noise), so the cross-video join is a plain equi-join on
    (frame_idx, fhash) — fully sub-quadratic, no banding needed, and
    duplication-proof the same way the hash-level Hamming join is
    (only matching hashes meet).  Constant frames (hash 0 — blank /
    letterbox padding) are excluded from matching: every short clip
    pads identically, and a real system masks blank frames for the
    same reason.  Returns (media_a, media_b, n_frames_matched)."""
    fh = (
        video_frame_hashes(media)
        .filter(F.col("fhash") != 0)
        .localCheckpoint(eager=True)  # feeds both sides of one join:
        # lazy would let the two branch stages race to materialize the
        # RDD, each re-running the frame-decode lineage (see
        # dedup/operators.py banded_hamming_pairs)
    )
    a = fh.select(
        F.col("media_id").alias("media_a"), "frame_idx", "fhash"
    )
    b = fh.select(
        F.col("media_id").alias("media_b"), "frame_idx", "fhash"
    )
    return (
        a.join(b, ["frame_idx", "fhash"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= min_frames)
    )


AUDIO_SEGMENTS = 61  # 60 envelope-gradient bits — band-compatible


def audio_fingerprint(
    media: DataFrame, *, segments: int = AUDIO_SEGMENTS
) -> DataFrame:
    """Per-clip audio fingerprint: decode → split the sample stream
    into ``segments`` equal spans → integer mean energy per span →
    envelope-gradient bits packed into one long (an echoprint-style
    60-bit key; the 1-D twin of the image dHash above, sharing its
    band join).

    Invariant to uniform gain change (means shift together, gradient
    SIGNS survive) and robust to localized sample noise (each bit
    averages over n/61 samples).  Integer-exact: span s covers sample
    indices [s·n//S, (s+1)·n//S), mean = sum // width (non-negative,
    so truncating and flooring division agree across engines); clips
    shorter than ``segments`` samples have no 1-sample-wide span and
    are excluded — mirrored by the oracle's length filter."""
    if segments - 1 > 63:
        raise ValueError("audio fingerprint exceeds 63 bits")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, _, arr = _decode_payload(bytes(content))
                flat = arr.ravel().astype(np.int64)
                n = flat.size
                if n < segments:
                    continue
                bounds = (np.arange(segments + 1) * n) // segments
                sums = np.add.reduceat(flat, bounds[:-1])
                widths = np.diff(bounds)
                means = sums // widths
                bits = (means[1:] > means[:-1]).ravel()
                key = 0
                for b in np.flatnonzero(bits):
                    key |= 1 << int(b)
                ids.append(mid)
                keys.append(key)
            yield pd.DataFrame({"media_id": ids, "dhash": keys})

    return media.filter(media.kind == "audio").mapInPandas(fn, PHASH_SCHEMA)


def near_dup_audio_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    *,
    segments: int = AUDIO_SEGMENTS,
) -> DataFrame:
    """Audio near-duplicate pairs: envelope fingerprints → the shared
    pigeonhole band join (dedup/operators.py banded_hamming_pairs) →
    exact Hamming verify.  Returns (media_a, media_b, hamming)."""
    from ..dedup.operators import banded_hamming_pairs

    sig = audio_fingerprint(media, segments=segments)
    return banded_hamming_pairs(
        sig,
        max_hamming,
        id_col="media_id",
        sig_col="dhash",
        bits=segments - 1,
    ).select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "hamming",
    )


FRAMES_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("frame_idx", T.IntegerType()),
        _f("height", T.IntegerType()),
        _f("width", T.IntegerType()),
        _f("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def sample_frames(media: DataFrame, *, every_n: int = 2) -> DataFrame:
    """Video → one output row per sampled frame (a flat-map: row count
    grows, which mapInPandas expresses naturally)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, meta, arr = _decode_payload(bytes(content))
                for i in range(0, meta["n_frames"], every_n):
                    rows.append(
                        (
                            mid,
                            i,
                            meta["height"],
                            meta["width"],
                            arr[i].ravel().tolist(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return media.filter(media.kind == "video").mapInPandas(fn, FRAMES_SCHEMA)
