from .analysis import (
    STOPWORDS,
    language_id,
    quality_features,
    token_counts,
    fingerprint_md5,
    rolling_fingerprint,
)
from .cleaning import (
    PII_PATTERNS,
    contamination_check,
    redact_pii,
    repetition_features,
)

__all__ = [
    "STOPWORDS",
    "language_id",
    "quality_features",
    "token_counts",
    "fingerprint_md5",
    "rolling_fingerprint",
    "PII_PATTERNS",
    "contamination_check",
    "redact_pii",
    "repetition_features",
]
