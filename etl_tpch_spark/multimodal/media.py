"""Media data model + the deterministic stand-in codec.

A media row is ``(media_id, kind, content: binary, meta: struct)`` —
the content bytes are opaque to the engine (never parsed JVM-side;
only sliced, hashed, filtered, shuffled), and every interpretation
happens in Python workers via Arrow batches.

The stand-in codec ("RAWM" format) is a real, self-describing byte
format — 16-byte header ``magic, kind, h, w, c, sr, n_frames`` + raw
uint8 samples — so decode genuinely parses bytes it didn't generate,
exactly the code path a JPEG/FLAC decode would take.  REAL codecs slot
in at ops._decode_payload (import-try for PIL etc.).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_f = T.StructField

_MAGIC = b"RAWM"
_KINDS = ("image", "audio", "video")
_HEADER = struct.Struct("<4sBHHBIH")  # magic kind h w c sample_rate n_frames

META_SCHEMA = T.StructType(
    [
        _f("height", T.IntegerType()),
        _f("width", T.IntegerType()),
        _f("channels", T.IntegerType()),
        _f("sample_rate", T.IntegerType()),
        _f("n_frames", T.IntegerType()),
        _f("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        _f("media_id", T.LongType()),
        _f("kind", T.StringType()),
        _f("content", T.BinaryType()),
        _f("meta", META_SCHEMA),
    ]
)


def encode_payload(
    kind: str,
    samples: np.ndarray,
    *,
    height: int = 0,
    width: int = 0,
    channels: int = 0,
    sample_rate: int = 0,
    n_frames: int = 0,
) -> bytes:
    """Pack uint8 samples into the RAWM container."""
    return _HEADER.pack(
        _MAGIC, _KINDS.index(kind), height, width, channels,
        sample_rate, n_frames,
    ) + samples.astype(np.uint8).tobytes()


def decode_payload(content: bytes) -> tuple[str, dict, np.ndarray]:
    """Parse a RAWM payload → (kind, meta dict, uint8 sample array).

    image → (h, w, c); audio → (n_samples,); video → (f, h, w, c).
    """
    magic, k, h, w, c, sr, nf = _HEADER.unpack_from(content)
    if magic != _MAGIC:
        raise ValueError("not a RAWM payload")
    kind = _KINDS[k]
    raw = np.frombuffer(content, np.uint8, offset=_HEADER.size)
    if kind == "image":
        arr = raw[: h * w * c].reshape(h, w, c)
    elif kind == "audio":
        arr = raw
    else:
        arr = raw[: nf * h * w * c].reshape(nf, h, w, c)
    meta = dict(
        height=h, width=w, channels=c, sample_rate=sr, n_frames=nf,
        format="rawm",
    )
    return kind, meta, arr


def _payload_udf():
    """Arrow-batched encoder: derives each row's pixels/samples from a
    per-row seed so content is deterministic and ~unique per id."""

    @F.pandas_udf(T.BinaryType())
    def make(media_id: pd.Series, kind: pd.Series, seed: pd.Series) -> pd.Series:
        out = []
        for mid, k, s in zip(media_id, kind, seed):
            rng = np.random.default_rng(int(s) ^ int(mid))
            if k == "image":
                h, w, c = int(rng.integers(8, 33)), int(rng.integers(8, 33)), 3
                out.append(encode_payload(
                    k, rng.integers(0, 256, h * w * c),
                    height=h, width=w, channels=c,
                ))
            elif k == "audio":
                n = int(rng.integers(256, 2049))
                out.append(encode_payload(
                    k, rng.integers(0, 256, n), sample_rate=16000,
                ))
            else:
                f, h, w, c = int(rng.integers(4, 17)), 16, 16, 3
                out.append(encode_payload(
                    k, rng.integers(0, 256, f * h * w * c),
                    height=h, width=w, channels=c, n_frames=f,
                ))
        return pd.Series(out)

    return make


def synthetic_media(
    spark: SparkSession, n: int = 300, *, seed: int = 42
) -> DataFrame:
    """Deterministic media table: ``spark.range`` + an encoder pandas
    UDF — generated distributed (no driver-side rows), so ``n`` can be
    millions on a cluster."""
    make = _payload_udf()
    kinds = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("id") % 3 + 1).cast("int"),
    )
    df = (
        spark.range(n)
        .withColumn("kind", kinds)
        .withColumn("content", make(F.col("id"), F.col("kind"), F.lit(seed)))
    )
    return df.selectExpr(
        "id AS media_id", "kind", "content", _meta_from_content_sql()
    )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge the testdata ``documents`` table into the media model:
    text bytes become an 'audio' payload (1 byte = 1 sample).  Gives
    multimodal ops a driver-provided, deterministic input."""
    from ..catalog import Tables

    docs = Tables(spark, sf_dir).documents
    # header: magic, kind=audio(1), h=0, w=0, c=0, sr=16000, nf=0
    hdr = (_MAGIC + struct.pack("<BHHBIH", 1, 0, 0, 0, 16000, 0)).hex()
    return docs.selectExpr(
        "doc_id AS media_id",
        "'audio' AS kind",
        f"CAST(concat(X'{hdr}', encode(text, 'utf-8')) AS binary)"
        " AS content",
        _meta_from_content_sql(),
    )


def image_media_from_documents(
    spark: SparkSession, sf_dir: str, *, height: int = 8, width: int = 8
) -> DataFrame:
    """Documents → deterministic IMAGE media: the first height·width
    text bytes become a 1-channel pixel grid (space-padded, so short
    docs still fill the frame).  Built entirely JVM-side — header
    literal + rpad + utf-8 encode — which is what makes the decode →
    resize → checksum pipeline ORACLE-expressible: DuckDB rebuilds the
    exact pixel bytes with ascii(substr(rpad(text))) (ASCII corpus, so
    codepoint == byte; same identity multimodal_byte_histogram pins)."""
    from ..catalog import Tables

    docs = Tables(spark, sf_dir).documents
    npix = height * width
    hdr = (
        _MAGIC + struct.pack("<BHHBIH", 0, height, width, 1, 0, 0)
    ).hex()
    return docs.selectExpr(
        "doc_id AS media_id",
        "'image' AS kind",
        f"CAST(concat(X'{hdr}', encode(rpad(substring(text, 1, "
        f"{npix}), {npix}, ' '), 'utf-8')) AS binary) AS content",
        _meta_from_content_sql(),
    )


def video_media_from_documents(
    spark: SparkSession,
    sf_dir: str,
    *,
    height: int = 4,
    width: int = 4,
    n_frames: int = 4,
) -> DataFrame:
    """Documents → deterministic VIDEO media: n_frames·height·width
    text bytes, space-padded, one 1-channel frame per height·width
    slice.  JVM-side construction ⇒ frame sampling is oracle-checkable
    (see image_media_from_documents)."""
    from ..catalog import Tables

    docs = Tables(spark, sf_dir).documents
    nbytes = n_frames * height * width
    hdr = (
        _MAGIC + struct.pack("<BHHBIH", 2, height, width, 1, 0, n_frames)
    ).hex()
    return docs.selectExpr(
        "doc_id AS media_id",
        "'video' AS kind",
        f"CAST(concat(X'{hdr}', encode(rpad(substring(text, 1, "
        f"{nbytes}), {nbytes}, ' '), 'utf-8')) AS binary) AS content",
        _meta_from_content_sql(),
    )


def _meta_from_content_sql() -> str:
    """Metadata struct parsed JVM-side from the binary header — no
    Python roundtrip for the fields the planner might filter on
    (little-endian byte slicing with built-in functions only).  One
    parser expression string (round 11, guide §4): the node-built form
    paid ~8 py4j round-trips per header byte."""

    def _le(offset: int, nbytes: int) -> str:
        return " + ".join(
            f"CAST(conv(hex(substring(content, {offset + i}, 1)), "
            f"16, 10) AS int) * {256 ** i}"
            for i in range(nbytes)
        )

    return (
        "named_struct("
        f"'height', {_le(6, 2)}, "
        f"'width', {_le(8, 2)}, "
        f"'channels', {_le(10, 1)}, "
        f"'sample_rate', {_le(11, 4)}, "
        f"'n_frames', {_le(15, 2)}, "
        "'format', 'rawm') AS meta"
    )
