from .media import (
    MEDIA_SCHEMA,
    media_table_from_docs,
    decode_media,
    extract_features,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table_from_docs",
    "decode_media",
    "extract_features",
    "sample_frames",
]
