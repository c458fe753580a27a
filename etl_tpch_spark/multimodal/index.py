"""Persisted perceptual-hash index — media near-dup at the daily-crawl
cadence, O(new batch) per tick.

The batch operator (ops.near_dup_media_pairs) re-decodes the whole
media corpus per run.  Perceptual hashes are content-derived — a stored
item's dHash never changes — so at 100 TB the 8-byte signature table is
the stored artifact and decode happens exactly once per item, at
ingest.  Same lifecycle as the MinHash signature index (dedup/index.py)
applied to media: TxTable storage (atomic versioned commits,
exactly-once batch ids, snapshot reads, OPTIMIZE), and a tick that

1. decodes + hashes ONLY the new batch (the single Arrow pass),
2. appends those (media_id, dhash) rows idempotently,
3. band-joins the new batch's DISTINCT hashes against the stored
   distinct-hash set (dedup/operators.py
   banded_hamming_pairs_touching) and verifies exact Hamming from
   stored values — the corpus contributes a columnar scan of 8-byte
   keys (signature-sized work, growing with stored hash vocabulary
   like any index scan), ZERO re-decode (the tick plan contains no
   Python stage; tests/test_media_index.py pins it).

This is the decisive scale asymmetry of perceptual dedup: media bytes
are huge (the 100 TB), signatures are 8 bytes/item — decode/hash work
is O(new batch) per tick and the stored side is media-free signature
I/O no matter how large the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.txlog import TxTable
from .ops import PHASH_BITS, PHASH_DST_H, PHASH_DST_W, perceptual_hash


class MediaHashIndex:
    """A TxTable of (media_id, dhash) perceptual-signature rows.

    IMAGE-only by contract: ingest hashes with the image dHash
    (ops.perceptual_hash), which filters kind == 'image' — rows of
    other kinds in an ingest batch contribute no signatures and no
    pairs.  Audio and video have their own fingerprint operators
    (ops.audio_fingerprint / ops.video_frame_hashes) with different
    key semantics (1-D envelope; per-frame keys), so a mixed-modality
    index would silently compare incomparable keys — callers with
    mixed batches should filter by kind and maintain one index per
    modality."""

    def __init__(
        self,
        path: str,
        *,
        dst_h: int = PHASH_DST_H,
        dst_w: int = PHASH_DST_W,
    ) -> None:
        self.table = TxTable(path)
        self.dst_h = dst_h
        self.dst_w = dst_w
        self.bits = dst_h * (dst_w - 1)

    def ingest(
        self, media: DataFrame, *, batch_id: str | None = None
    ) -> int:
        """Decode + hash ``media`` (ONE Arrow pass over the new batch
        — no persist; the TxTable parquet IS the materialization) and
        append the signature rows atomically.  A replayed ``batch_id``
        ingests nothing (exactly-once)."""
        return self.table.append(
            perceptual_hash(media, dst_h=self.dst_h, dst_w=self.dst_w),
            batch_id=batch_id,
        )

    def signatures(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Snapshot read of the stored signature rows."""
        return self.table.read(spark, version)

    def pairs_touching(
        self, spark: SparkSession, new_ids: DataFrame, max_hamming: int
    ) -> DataFrame:
        """Near-dup pairs touching ``new_ids`` (one column media_id),
        computed ENTIRELY from stored signatures: band join + Hamming
        verify both read the index parquet — no media content is
        decoded in this plan.  Returns (media_a, media_b, hamming)."""
        from pyspark.sql import functions as F

        from ..dedup.operators import banded_hamming_pairs_touching

        return banded_hamming_pairs_touching(
            self.signatures(spark),
            new_ids,
            max_hamming,
            id_col="media_id",
            sig_col="dhash",
            bits=self.bits,
        ).select(
            F.col("id_a").alias("media_a"),
            F.col("id_b").alias("media_b"),
            "hamming",
        )

    def tick(
        self,
        spark: SparkSession,
        new_media: DataFrame,
        max_hamming: int,
        *,
        batch_id: str | None = None,
    ) -> DataFrame:
        """One daily-crawl tick: ingest the new batch's signatures
        (idempotent), then return the near-dup pairs touching it.
        Cost per tick: one decode+hash pass over the NEW media + one
        columnar scan of stored 8-byte signatures — O(new), and
        media-free on the stored side."""
        self.ingest(new_media, batch_id=batch_id)
        from pyspark.sql import functions as F

        new_ids = new_media.select(
            F.col("media_id").cast("long").alias("media_id")
        )
        return self.pairs_touching(spark, new_ids, max_hamming)

    def compact(self, spark: SparkSession, target_files: int = 8) -> int:
        """OPTIMIZE accreted tick files (maintenance cadence)."""
        return self.table.compact(spark, target_files=target_files)
