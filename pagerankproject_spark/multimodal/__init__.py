from .media import (
    MEDIA_META_SCHEMA,
    media_metadata,
    sniff_mime_expr,
    decode_media,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "media_metadata",
    "sniff_mime_expr",
    "decode_media",
    "extract_image_features",
    "sample_video_frames",
]
