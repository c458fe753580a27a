"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not present in the reference (its only ML surface is the vestigial
XGBoost model, SURVEY.md §1.4); this is the north-star extension for
training-data pipelines: media travels through the lakehouse as a
``binary`` column with a typed metadata struct, and every transform is
an Arrow-batched ``mapInPandas`` stage — the Spark plumbing (schemas,
batch iteration, partition sizing) is real and tested.

Codec reality: this container has no image/audio libraries, so payloads
use a deterministic in-repo byte format (``media.encode_*``/
``decode_*``) — a stand-in with the same shape as a JPEG/WAV decode.
``ops.decode_media`` routes through an import-try so dropping in
PIL/soundfile swaps the codec without touching any Spark code.
"""

from .media import MEDIA_SCHEMA, media_from_documents, synthetic_media
from .ops import (
    decode_media,
    image_features,
    near_dup_media_pairs,
    perceptual_hash,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media",
    "media_from_documents",
    "decode_media",
    "resize_images",
    "image_features",
    "sample_frames",
    "perceptual_hash",
    "near_dup_media_pairs",
]
