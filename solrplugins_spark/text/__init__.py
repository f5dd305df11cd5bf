from .analysis import (
    STOPWORDS,
    language_id,
    quality_features,
    quality_filter,
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
from .lm import (
    BigramLM,
    ppl_bucket,
    score_bigram_lm,
    train_bigram_lm,
)
from .sampling import (
    cap_per_stratum,
    chunk_documents,
    deterministic_sample,
    mixture_rates,
    mixture_sample,
    epoch_shard,
    pack_sequences,
    stratified_sample,
)

__all__ = [
    "STOPWORDS",
    "language_id",
    "quality_features",
    "quality_filter",
    "token_counts",
    "fingerprint_md5",
    "rolling_fingerprint",
    "PII_PATTERNS",
    "contamination_check",
    "redact_pii",
    "repetition_features",
    "deterministic_sample",
    "stratified_sample",
    "pack_sequences",
    "chunk_documents",
    "epoch_shard",
    "BigramLM",
    "train_bigram_lm",
    "score_bigram_lm",
    "ppl_bucket",
    "mixture_rates",
    "mixture_sample",
    "cap_per_stratum",
]
