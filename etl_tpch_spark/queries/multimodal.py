"""Driver-registered multimodal queries (rows+hash where the oracle can
express the semantics; rows-only where decode is Python-side).

The media input derives deterministically from the driver ``documents``
table (multimodal/media.py:media_from_documents), so sf_dir remains the
single data root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_media, image_features, media_from_documents
from ..registry import query


@query(
    "multimodal_decode_lengths",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
        FROM documents
    """,
)
def multimodal_decode_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary plumbing check the oracle CAN express: encode
    text → RAWM container (JVM-side) → mapInPandas decode → sample
    count must equal the utf-8 byte length DuckDB computes."""
    media = media_from_documents(spark, sf_dir)
    return decode_media(media, keep_samples=False).select(
        "media_id", "n_samples"
    )


# ascii(substr(...)) byte reconstruction shared by the three oracles
# below — valid because the corpus is pure ASCII (codepoint == utf-8
# byte), the identity multimodal_byte_histogram/decode_lengths pin.

@query(
    "multimodal_feature_extract",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, length(text) + 1),
                       i -> ascii(substr(text, i, 1)))) AS v
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS sx,
                   CAST(sum(v * v) AS BIGINT) AS sx2
            FROM b GROUP BY 1
        )
        SELECT doc_id AS media_id,
               round(CAST(sx AS DOUBLE) / n, 6) AS mean,
               round(sqrt((CAST(sx2 AS DOUBLE) * n
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * n)), 6) AS std,
               CAST(16 AS INTEGER) AS feature_dim
        FROM m
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item feature extraction through the REAL decode path, fully
    hash-checked: mapInPandas decode → exact-integer-moment mean/std
    (multimodal/ops.py image_features computes Σx, Σx² as exact int64
    and derives both stats with one division + one sqrt, so the oracle
    reproduces them bit-for-bit from the reconstructed bytes — numpy's
    pairwise-summation std could not be) + the 16-bin histogram feature
    vector's dimension."""
    media = media_from_documents(spark, sf_dir)
    return image_features(media, bins=16).select(
        "media_id", "mean", "std", F.size("feature").alias("feature_dim")
    )


_RESIZE_SRC = 8  # source grid; text bytes 1..64 are the pixels
_RESIZE_DST = 4
# nearest-neighbor index map of ops.resize_images: row/col r of the
# destination reads source index r*src//dst — 1-based flat positions
_RESIZE_POSITIONS = [
    (r * _RESIZE_SRC // _RESIZE_DST) * _RESIZE_SRC
    + (c * _RESIZE_SRC // _RESIZE_DST)
    + 1
    for r in range(_RESIZE_DST)
    for c in range(_RESIZE_DST)
]


@query(
    "multimodal_resize",
    oracle=f"""
        SELECT doc_id AS media_id,
               CAST({_RESIZE_DST} AS INTEGER) AS height,
               CAST({_RESIZE_DST} AS INTEGER) AS width,
               CAST(list_sum(list_transform(
                   {_RESIZE_POSITIONS},
                   p -> ascii(substr(rpad(substr(text, 1, 64), 64, ' '),
                                     p, 1)))) AS BIGINT) AS pixel_sum
        FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor image resize (8×8 → 4×4) through the REAL
    decode path, hash-checked: documents become 1-channel images
    JVM-side (first 64 text bytes, space-padded —
    multimodal/media.py image_media_from_documents), mapInPandas
    decodes and resizes, and the pixel checksum must equal the oracle's
    sum over the same nearest-neighbor source positions rebuilt with
    ascii(substr(rpad(...))).  Content-sensitive: any wrong pixel,
    index map, or pad byte shifts the sum."""
    from ..multimodal.media import image_media_from_documents
    from ..multimodal.ops import resize_images

    media = image_media_from_documents(
        spark, sf_dir, height=_RESIZE_SRC, width=_RESIZE_SRC
    )
    resized = resize_images(media, height=_RESIZE_DST, width=_RESIZE_DST)
    return resized.select(
        "media_id",
        "height",
        "width",
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("pixel_sum"),
    )


_FRAME_H = 4
_FRAME_W = 4
_N_FRAMES = 4
_EVERY_N = 2
_FRAME_BYTES = _FRAME_H * _FRAME_W


@query(
    "multimodal_frame_sample",
    oracle=f"""
        SELECT doc_id AS media_id,
               CAST(f AS INTEGER) AS frame_idx,
               CAST(list_sum(list_transform(
                   range(f * {_FRAME_BYTES} + 1, (f + 1) * {_FRAME_BYTES} + 1),
                   p -> ascii(substr(
                        rpad(substr(text, 1, {_N_FRAMES * _FRAME_BYTES}),
                             {_N_FRAMES * _FRAME_BYTES}, ' '),
                        p, 1)))) AS BIGINT) AS pixel_sum
        FROM documents,
             unnest(range(0, {_N_FRAMES}, {_EVERY_N})) AS t(f)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame) through the REAL decode
    path, hash-checked: documents become 4-frame 4×4 videos JVM-side
    (multimodal/media.py video_media_from_documents), mapInPandas
    decodes and flat-maps one row per sampled frame, and each frame's
    pixel checksum must equal the oracle's sum over that frame's byte
    slice.  Pins the frame stride, the frame→byte-range mapping, and
    the row-count growth of the flat-map."""
    from ..multimodal.media import video_media_from_documents
    from ..multimodal.ops import sample_frames

    media = video_media_from_documents(
        spark, sf_dir, height=_FRAME_H, width=_FRAME_W, n_frames=_N_FRAMES
    )
    frames = sample_frames(media, every_n=_EVERY_N)
    return frames.select(
        "media_id",
        "frame_idx",
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("pixel_sum"),
    )


# --- perceptual near-dup ------------------------------------------------
# dHash parameters: 12×22 source images (first 264 text bytes,
# 1-channel, space-padded — media.image_media_from_documents), 6×11
# nearest-neighbor downscale, 60 gradient bits, Hamming ≤ 3 via 4×15-bit
# pigeonhole bands.  Every constant below is mirrored into the oracle.
_PH_SRC_H, _PH_SRC_W = 12, 22
_PH_DST_H, _PH_DST_W = 6, 11
_PH_NBYTES = _PH_SRC_H * _PH_SRC_W
_PH_GW = _PH_DST_W - 1  # gradient bits per row
_PH_BITS = _PH_DST_H * _PH_GW  # 60
_PH_MAX_HAMMING = 3
# 1-based flat source positions of the nearest-neighbor downscale —
# the resize_images index map (row r reads source row r*src//dst)
_PH_POSITIONS = [
    (r * _PH_SRC_H // _PH_DST_H) * _PH_SRC_W + (c * _PH_SRC_W // _PH_DST_W) + 1
    for r in range(_PH_DST_H)
    for c in range(_PH_DST_W)
]


@query(
    "multimodal_near_dup_pairs",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform({_PH_POSITIONS},
                       p -> ascii(substr(
                           rpad(substr(text, 1, {_PH_NBYTES}),
                                {_PH_NBYTES}, ' '), p, 1))) AS v
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN v[(b // {_PH_GW}) * {_PH_DST_W}
                                        + (b % {_PH_GW}) + 2] >
                                      v[(b // {_PH_GW}) * {_PH_DST_W}
                                        + (b % {_PH_GW}) + 1]
                            THEN (CAST(1 AS BIGINT) << b)
                            ELSE 0 END) AS BIGINT) AS dhash
            FROM px, unnest(range(0, {_PH_BITS})) AS t(b)
            GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, dhash, b AS band_idx,
                   (dhash >> (b * 15)) & 32767 AS band_val
            FROM h, unnest(range(0, {_PH_MAX_HAMMING + 1})) AS t(b)
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS media_a, x.dhash AS ha,
                            y.doc_id AS media_b, y.dhash AS hb
            FROM bands x JOIN bands y USING (band_idx, band_val)
            WHERE x.doc_id < y.doc_id
        )
        SELECT media_a, media_b,
               CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= {_PH_MAX_HAMMING}
    """,
)
def multimodal_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs, fully hash-checked — the
    dedup modality byte checksums can't provide (multimodal/ops.py
    near_dup_media_pairs): documents become 12×22 1-channel images
    JVM-side, the Arrow decode pass computes a 60-bit dHash (grayscale
    → 6×11 nearest-neighbor downscale → horizontal gradient bits), and
    near-dup pairs (Hamming ≤ 3) come from the SAME pigeonhole band
    join SimHash uses (dedup/operators.py banded_hamming_pairs — exact
    recall, sub-quadratic: one shuffle on 4×15-bit band keys).  The
    oracle rebuilds the identical hash from ascii(substr(rpad(...)))
    bytes and joins the identical bands; the brute-force Hamming twin
    is pinned equal in tests/test_multimodal_neardup.py."""
    from ..multimodal.media import image_media_from_documents
    from ..multimodal.ops import near_dup_media_pairs

    media = image_media_from_documents(
        spark, sf_dir, height=_PH_SRC_H, width=_PH_SRC_W
    )
    return near_dup_media_pairs(
        media, _PH_MAX_HAMMING, dst_h=_PH_DST_H, dst_w=_PH_DST_W
    )


@query(
    "multimodal_near_dup_incremental",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform({_PH_POSITIONS},
                       p -> ascii(substr(
                           rpad(substr(text, 1, {_PH_NBYTES}),
                                {_PH_NBYTES}, ' '), p, 1))) AS v
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN v[(b // {_PH_GW}) * {_PH_DST_W}
                                        + (b % {_PH_GW}) + 2] >
                                      v[(b // {_PH_GW}) * {_PH_DST_W}
                                        + (b % {_PH_GW}) + 1]
                            THEN (CAST(1 AS BIGINT) << b)
                            ELSE 0 END) AS BIGINT) AS dhash
            FROM px, unnest(range(0, {_PH_BITS})) AS t(b)
            GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, dhash, b AS band_idx,
                   (dhash >> (b * 15)) & 32767 AS band_val
            FROM h, unnest(range(0, {_PH_MAX_HAMMING + 1})) AS t(b)
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS media_a, x.dhash AS ha,
                            y.doc_id AS media_b, y.dhash AS hb
            FROM bands x JOIN bands y USING (band_idx, band_val)
            WHERE x.doc_id < y.doc_id
        )
        SELECT media_a, media_b,
               CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= {_PH_MAX_HAMMING}
          AND (media_a % 2 = 1 OR media_b % 2 = 1)
    """,
)
def multimodal_near_dup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental (daily-crawl) media near-dup through the PERSISTED
    signature index (multimodal/index.py MediaHashIndex): even
    media_ids play the existing corpus (yesterday's index state), odd
    ids the new batch.  The tick decodes + hashes ONLY the new batch,
    appends the 8-byte signatures to the index TxTable, and band-joins
    the new bands against ALL stored signatures — stored media is
    NEVER re-decoded (the tick plan has no Python stage for stored
    rows; tests/test_media_index.py pins it).  Exact recall by the
    pigeonhole argument, so the oracle is the batch band join
    restricted to pairs touching the new batch."""
    from ..catalog import scratch_index_dir
    from ..multimodal.index import MediaHashIndex
    from ..multimodal.media import image_media_from_documents

    media = image_media_from_documents(
        spark, sf_dir, height=_PH_SRC_H, width=_PH_SRC_W
    )
    corpus = media.filter(F.col("media_id") % 2 == 0)
    new = media.filter(F.col("media_id") % 2 == 1)
    idx = MediaHashIndex(scratch_index_dir("mediahash-idx", sf_dir))
    idx.ingest(corpus, batch_id="corpus-day0")
    return idx.tick(spark, new, _PH_MAX_HAMMING, batch_id="crawl-day1")


# video near-dup: 4 frames of 6×11 (264 bytes = the same text prefix
# the image dHash uses), 60 gradient bits per frame, match = ≥2
# temporally-aligned identical non-blank frame fingerprints
_VH_H, _VH_W, _VH_F = 6, 11, 4
_VH_FB = _VH_H * _VH_W  # bytes per frame
_VH_NB = _VH_F * _VH_FB
_VH_GW = _VH_W - 1
_VH_BITS = _VH_H * _VH_GW
_VH_MIN_FRAMES = 2


@query(
    "multimodal_video_near_dup",
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   list_transform(range(1, {_VH_NB} + 1),
                       i -> ascii(substr(
                           rpad(substr(text, 1, {_VH_NB}),
                                {_VH_NB}, ' '), i, 1))) AS v
            FROM documents
        ),
        fh AS (
            SELECT doc_id, CAST(s AS INTEGER) AS frame_idx,
                   CAST(sum(CASE WHEN
                         v[s * {_VH_FB} + (b // {_VH_GW}) * {_VH_W}
                           + (b % {_VH_GW}) + 2] >
                         v[s * {_VH_FB} + (b // {_VH_GW}) * {_VH_W}
                           + (b % {_VH_GW}) + 1]
                       THEN (CAST(1 AS BIGINT) << b)
                       ELSE 0 END) AS BIGINT) AS fhash
            FROM px, unnest(range(0, {_VH_F})) AS t(s),
                     unnest(range(0, {_VH_BITS})) AS u(b)
            GROUP BY doc_id, s
        )
        SELECT a.doc_id AS media_a, b.doc_id AS media_b,
               CAST(count(*) AS BIGINT) AS n_frames_matched
        FROM fh a
        JOIN fh b ON a.frame_idx = b.frame_idx
                 AND a.fhash = b.fhash
                 AND a.doc_id < b.doc_id
        WHERE a.fhash <> 0
        GROUP BY 1, 2
        HAVING count(*) >= {_VH_MIN_FRAMES}
    """,
)
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO near-duplicate pairs, fully hash-checked — the third
    modality of the perceptual dedup family (multimodal/ops.py
    near_dup_video_pairs): documents become 4-frame 6×11 videos
    JVM-side, the Arrow decode pass emits one 60-bit gradient
    fingerprint per frame, and two clips match when ≥2
    temporally-aligned NON-BLANK frames carry identical fingerprints
    (robust per-frame hash + exact equality — the production video
    dedup shape; constant padding frames are masked or every short
    clip would pair with every other).  One equi-join on
    (frame_idx, fhash): sub-quadratic and duplication-proof.  The
    oracle rebuilds every frame fingerprint from its byte slice."""
    from ..multimodal.media import video_media_from_documents
    from ..multimodal.ops import near_dup_video_pairs

    media = video_media_from_documents(
        spark, sf_dir, height=_VH_H, width=_VH_W, n_frames=_VH_F
    )
    return near_dup_video_pairs(media, min_frames=_VH_MIN_FRAMES)


_AF_S = 61  # audio envelope segments → 60 gradient bits


@query(
    "multimodal_audio_fingerprint",
    oracle=f"""
        WITH px AS (
            SELECT doc_id, length(text) AS n,
                   list_transform(range(1, length(text) + 1),
                       i -> ascii(substr(text, i, 1))) AS v
            FROM documents WHERE length(text) >= {_AF_S}
        ),
        m AS (
            SELECT doc_id,
                   list_transform(range(0, {_AF_S}),
                       s -> list_sum(
                                v[(s * n) // {_AF_S} + 1
                                  : ((s + 1) * n) // {_AF_S}])
                            // (((s + 1) * n) // {_AF_S}
                                - (s * n) // {_AF_S})) AS means
            FROM px
        )
        SELECT doc_id AS media_id,
               CAST(sum(CASE WHEN means[b + 2] > means[b + 1]
                        THEN (CAST(1 AS BIGINT) << b)
                        ELSE 0 END) AS BIGINT) AS dhash
        FROM m, unnest(range(0, {_AF_S - 1})) AS t(b)
        GROUP BY doc_id
    """,
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip AUDIO fingerprint through the real decode path, fully
    hash-checked (multimodal/ops.py audio_fingerprint): documents
    become audio clips (1 byte = 1 sample), the Arrow decode pass
    splits each stream into 61 equal spans, takes integer mean energy
    per span, and packs the 60 envelope-gradient bits into one long —
    the echoprint-style key whose banded near-dup join
    (near_dup_audio_pairs) shares the SimHash/dHash pigeonhole kernel.
    Gain-shift invariance and the band-join recall contract are pinned
    on synthetic clips in tests/test_multimodal_neardup.py (this
    corpus's near-dup texts differ by INSERTIONS, which shift every
    later sample — real misaligned audio needs overlapping frames, so
    the pair query would be trivially empty here; the fingerprint row
    is the content-sensitive check).  The oracle rebuilds every span
    mean from ascii bytes with the same floor divisions."""
    from ..multimodal.ops import audio_fingerprint

    media = media_from_documents(spark, sf_dir)
    return audio_fingerprint(media, segments=_AF_S)


@query(
    "multimodal_byte_histogram",
    oracle="""
        SELECT CAST(b // 16 AS INTEGER) AS bucket,
               CAST(count(*) AS BIGINT) AS n_samples
        FROM (
            SELECT unnest(list_transform(
                       range(1, length(text) + 1),
                       i -> ascii(substr(text, i, 1)))) AS b
            FROM documents
        )
        GROUP BY 1
    """,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide sample-value histogram through the REAL decode path
    — the first multimodal query whose Python-side decode is fully
    hash-checked, not rows-only: RAWM container built JVM-side →
    mapInPandas binary parse → explode samples → 16-bucket histogram.
    The oracle rebuilds identical byte values from the source text
    (the corpus is ASCII, so codepoint == utf-8 byte — the same
    identity multimodal_decode_lengths pins for lengths).  Plan: decode
    is one Python stage, then one shuffle on the 16 bucket keys with
    map-side partial aggregation — sample volume never crosses a
    shuffle."""
    media = media_from_documents(spark, sf_dir)
    dec = decode_media(media, keep_samples=True)
    return (
        dec.select(F.explode("samples").alias("b"))
        .groupBy(F.floor(F.col("b") / 16).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_samples"))
    )
