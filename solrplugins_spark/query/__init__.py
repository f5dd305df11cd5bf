from .scorer import Similarity, BM25, ClassicDice, score_terms, search_terms
from .parser import Lexer, QueryLexer, RecursiveDescentParser, parse_query
from . import ast
from .compiler import compile_ast, execute_query
from .mlt import (
    MLTParams,
    interesting_terms,
    interesting_terms_text,
    more_like_text,
    more_like_this,
)
from .feedback import unsupervised_feedback

__all__ = [
    "Similarity",
    "BM25",
    "ClassicDice",
    "score_terms",
    "search_terms",
    "Lexer",
    "QueryLexer",
    "RecursiveDescentParser",
    "parse_query",
    "ast",
    "compile_ast",
    "execute_query",
    "MLTParams",
    "interesting_terms",
    "interesting_terms_text",
    "more_like_text",
    "more_like_this",
    "unsupervised_feedback",
]
