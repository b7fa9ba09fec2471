"""Multimodal columns (X4): image/audio/video as opaque binary + metadata."""

from .decode import (
    MEDIA_META_SCHEMA,
    attach_payload_meta,
    decode_image_batch,
    decode_video_frames,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_payload_meta",
    "decode_image_batch",
    "decode_video_frames",
    "extract_image_features",
    "sample_video_frames",
]
