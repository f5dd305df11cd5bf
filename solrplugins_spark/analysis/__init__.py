from .tokenizer import (
    TOKEN_PATTERN,
    tokens_col,
    tokenize,
    tokenize_pandas,
    counted_terms,
)
from .filters import (
    constant_token_filter,
    concatenate_tokens,
    payload_boost_tokens,
    mean_payload,
)

__all__ = [
    "TOKEN_PATTERN",
    "tokens_col",
    "tokenize",
    "tokenize_pandas",
    "counted_terms",
    "constant_token_filter",
    "concatenate_tokens",
    "payload_boost_tokens",
    "mean_payload",
]
