from .analysis import (
    STOPWORDS,
    language_id,
    quality_features,
    token_counts,
    fingerprint_md5,
    rolling_fingerprint,
)

__all__ = [
    "STOPWORDS",
    "language_id",
    "quality_features",
    "token_counts",
    "fingerprint_md5",
    "rolling_fingerprint",
]
