from .valuesources import (
    FUNCTION_REGISTRY,
    term_freq,
    binary_term_exists,
    field_len,
    field_val,
    term_intersect,
    term_overlap,
    with_function,
)

__all__ = [
    "FUNCTION_REGISTRY",
    "term_freq",
    "binary_term_exists",
    "field_len",
    "field_val",
    "term_intersect",
    "term_overlap",
    "with_function",
]
