from .builder import (
    InvertedIndex,
    build_index,
    forward_index,
    mint_doc_ids,
)
from .codec import (
    decode_payloads,
    decode_positions,
    decode_postings,
    encode_payloads,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)
from .segments import (
    SegmentIndex,
    build_segments,
    compact_packed,
    wand_boolean_search,
    wand_phrase_search,
    wand_phrase_search_multi,
    wand_search,
    wand_search_multi,
)

__all__ = [
    "InvertedIndex",
    "build_index",
    "forward_index",
    "mint_doc_ids",
    "encode_postings",
    "decode_postings",
    "encode_positions",
    "decode_positions",
    "encode_payloads",
    "decode_payloads",
    "varint_encode",
    "varint_decode",
    "SegmentIndex",
    "build_segments",
    "compact_packed",
    "wand_boolean_search",
    "wand_phrase_search",
    "wand_phrase_search_multi",
    "wand_search",
    "wand_search_multi",
]
