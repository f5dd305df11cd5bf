from .builder import (
    InvertedIndex,
    build_index,
    forward_index,
    mint_doc_ids,
)
from .codec import encode_postings, decode_postings, varint_encode, varint_decode

__all__ = [
    "InvertedIndex",
    "build_index",
    "forward_index",
    "mint_doc_ids",
    "encode_postings",
    "decode_postings",
    "varint_encode",
    "varint_decode",
]
