from .dedup import (
    exact_duplicates,
    minhash_signatures,
    minhash_duplicate_pairs,
    simhash64,
    simhash_duplicate_pairs,
    ngram_jaccard_pairs,
    ngram_cap_dropped,
    duplicate_clusters,
    apply_dedup,
    embedding_near_duplicates,
)

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "minhash_duplicate_pairs",
    "simhash64",
    "simhash_duplicate_pairs",
    "ngram_jaccard_pairs",
    "ngram_cap_dropped",
    "duplicate_clusters",
    "apply_dedup",
    "embedding_near_duplicates",
]
