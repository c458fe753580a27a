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


@query("multimodal_feature_extract", tags=("rows-only",))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature vectors over document-derived media —
    decode + featurize is Python-side (no SQL oracle); the driver's
    rows-only check applies."""
    media = media_from_documents(spark, sf_dir)
    return image_features(media, bins=16).select(
        "media_id", "mean", "std", F.size("feature").alias("feature_dim")
    )


@query("multimodal_resize", tags=("rows-only",))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor image resize to 8×8 over the deterministic
    synthetic media table (multimodal/ops.py resize_images) — the
    Python-decode path has no SQL oracle; rows-only.  The pixel
    checksum makes the result order-insensitive but content-sensitive."""
    from ..multimodal.media import synthetic_media
    from ..multimodal.ops import resize_images

    media = synthetic_media(spark, n=120)
    resized = resize_images(media, height=8, width=8)
    return resized.select(
        "media_id",
        "height",
        "width",
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("pixel_sum"),
    )


@query("multimodal_frame_sample", tags=("rows-only",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 2nd frame) over synthetic media —
    a flat-map that grows row count (multimodal/ops.py sample_frames);
    rows-only like all Python-decode paths."""
    from ..multimodal.media import synthetic_media
    from ..multimodal.ops import sample_frames

    media = synthetic_media(spark, n=120)
    frames = sample_frames(media, every_n=2)
    return frames.select(
        "media_id",
        "frame_idx",
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("pixel_sum"),
    )


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
