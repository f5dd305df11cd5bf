from .spellcheck import (
    SpellNgramIndex,
    build_spell_ngram_index,
    load_typos,
    spellcheck_collations,
    spellcheck_suggest,
)
from .suggester import (
    case_variants,
    case_variant_suggest,
    canonical_suggest,
    high_frequency_dictionary,
    file_dictionary,
)

__all__ = [
    "SpellNgramIndex",
    "build_spell_ngram_index",
    "load_typos",
    "spellcheck_suggest",
    "spellcheck_collations",
    "case_variants",
    "case_variant_suggest",
    "canonical_suggest",
    "high_frequency_dictionary",
    "file_dictionary",
]
