"""Query lexer + error-recovering recursive-descent boolean parser.

Behavioral parity with the reference parser, asserted by the 23 ported
golden tests (tests/test_parser.py):
- Lexer (Lexer.java:14-135): separators ``[ ,;]``; preprocessing forces
  ``name :`` variants to a single ``name:`` FIELD token and spaces out
  parens/quotes; keywords and/or/not case-insensitive; token codes
  EOF/TOKEN/FIELD/OR/AND/NOT/LEFT/RIGHT/QUOTE.
- QueryLexer (QueryLexer.java:18-71): one-pass classification flags —
  isAndQuery (any AND) and isAdvancedQuery (any operator/paren/quote).
- RecursiveDescentParser (RecursiveDescentParser.java:14-156):
  precedence NOT > AND > OR; bare adjacency = OR
  (sequenceExpression); error recovery inserts the missing-token value
  (``*:*``), swallows unbalanced parens, and eats an unterminated
  quote to end-of-input; error codes 1-4 (ParserErrors.java:6-10).
"""

from __future__ import annotations

import enum
import re

from . import ast


class Sym(enum.IntEnum):
    EOF = -1
    NONE = 0
    OR = 1
    AND = 2
    NOT = 3
    LEFT = 6
    RIGHT = 7
    QUOTE = 8
    FIELD = 9
    TOKEN = 999


class ParserErrors(enum.IntEnum):
    MissingLeftParen = 1
    MissingRightParen = 2
    MissingQuoteCharacter = 3
    MalFormedExpression = 4


_KEYWORDS = {
    "(": Sym.LEFT,
    ")": Sym.RIGHT,
    "and": Sym.AND,
    "or": Sym.OR,
    "not": Sym.NOT,
    '"': Sym.QUOTE,
}

_FIELD_COLON = re.compile(r"(\s+:\s+|\s+:|:\s+|:)")
_PAREN_QUOTE = re.compile(r'([()"])')
_WS = re.compile(r"\s+")
_SEPARATOR = re.compile(r"[ ,;]")


def _preprocess(s: str | None) -> str:
    if s is None:
        return ""
    s = s.strip()
    s = _FIELD_COLON.sub(": ", s)
    s = _PAREN_QUOTE.sub(r" \1 ", s)
    s = _WS.sub(" ", s)
    return s


class Lexer:
    """Streaming lexer; ``next_symbol()`` + ``text`` mirror
    Lexer.nextSymbol()/toString()."""

    def __init__(self, s: str | None):
        self._tokens = [t for t in _SEPARATOR.split(_preprocess(s)) if t.strip()]
        self._i = -1
        self.text = ""

    def next_symbol(self) -> Sym:
        self._i += 1
        if self._i >= len(self._tokens):
            self.text = ""
            return Sym.EOF
        self.text = self._tokens[self._i]
        lc = self.text.lower()
        if lc in _KEYWORDS:
            return _KEYWORDS[lc]
        if lc.endswith(":"):
            return Sym.FIELD
        return Sym.TOKEN

    @staticmethod
    def tokenize(s: str | None) -> list[Sym]:
        lx = Lexer(s)
        out = []
        while (sym := lx.next_symbol()) != Sym.EOF:
            out.append(sym)
        return out


class QueryLexer(Lexer):
    """Classification pass: isAndQuery / isAdvancedQuery flags route
    queries to alternate request configs
    (BooleanQueryPreProcessorComponent.java:105-130)."""

    def __init__(self, s: str | None):
        super().__init__(s)
        syms = Lexer.tokenize(s)
        self.is_and_query = Sym.AND in syms
        self.is_advanced_query = any(
            sym in (Sym.AND, Sym.OR, Sym.NOT, Sym.LEFT, Sym.RIGHT, Sym.QUOTE)
            for sym in syms
        )


class RecursiveDescentParser:
    """Grammar (precedence low->high): or -> and -> sequence -> terminal.

    sequence = adjacency OR-folding: ``java sql`` == ``(java OR sql)``.
    """

    def __init__(self, lexer: Lexer, missing_token_value: str = "*:*"):
        self.lexer = lexer
        self.missing = missing_token_value
        self.symbol: Sym = Sym.NONE
        self.root: ast.Expression = ast.Operand(missing_token_value)
        self.errors: set[ParserErrors] = set()

    def parse(self) -> ast.Expression:
        self._or_expression()
        if self.symbol != Sym.EOF:
            if self.symbol == Sym.RIGHT:
                self.errors.add(ParserErrors.MissingLeftParen)
            else:
                self.errors.add(ParserErrors.MalFormedExpression)
        return self.root

    def has_errors(self) -> bool:
        return bool(self.errors)

    def _or_expression(self) -> None:
        self._and_expression()
        while self.symbol == Sym.OR:
            left = self.root
            self._and_expression()
            self.root = ast.Or(left, self.root)

    def _and_expression(self) -> None:
        self._sequence_expression()
        while self.symbol == Sym.AND:
            left = self.root
            self._sequence_expression()
            self.root = ast.And(left, self.root)

    def _sequence_expression(self) -> None:
        self._term()
        while self.symbol in (Sym.TOKEN, Sym.QUOTE, Sym.FIELD):
            left = self.root
            self._process_terminal()
            self.root = ast.Or(left, self.root)

    def _quoted_expression(self) -> None:
        parts: list[str] = []
        # eat everything (operators included) until closing quote or EOF
        while True:
            self.symbol = self.lexer.next_symbol()
            if self.symbol in (Sym.QUOTE, Sym.EOF):
                break
            parts.append(self.lexer.text)
        phrase = " ".join(parts).strip()
        if not phrase:
            self.errors.add(ParserErrors.MissingQuoteCharacter)
        self.symbol = self.lexer.next_symbol()
        # `"a b"~n` proximity suffix (grammar EXTENSION — the reference
        # has exact phrases only): _preprocess spaces quotes out, so the
        # suffix arrives as its own `~n` token right after the closing
        # quote. Anything else (incl. a bare `~foo` term) is untouched.
        slop = 0
        if self.symbol == Sym.TOKEN and re.fullmatch(r"~\d+", self.lexer.text):
            slop = int(self.lexer.text[1:])
            self.symbol = self.lexer.next_symbol()
        self.root = ast.Quote(ast.Operand(phrase), slop=slop)

    def _term(self) -> None:
        self.symbol = self.lexer.next_symbol()
        self._process_terminal()

    _RANGE_SPLIT = re.compile(r"\s+to\s+", re.IGNORECASE)

    def _range_expression(self) -> None:
        """`[a TO b]` / `{a TO b}` terminal (grammar extension — the
        reference's range test is @Ignore'd). The lexer splits on
        spaces, so the range spans tokens until one ends with ]/}."""
        open_ch = self.lexer.text[0]
        parts = [self.lexer.text[1:]]
        close_ch = None
        while not parts[-1].endswith(("]", "}")):
            self.symbol = self.lexer.next_symbol()
            if self.symbol == Sym.EOF:
                break
            parts.append(self.lexer.text)
        body = " ".join(parts).strip()
        if body.endswith(("]", "}")):
            close_ch = body[-1]
            body = body[:-1].strip()
        else:
            self.errors.add(ParserErrors.MalFormedExpression)
        halves = self._RANGE_SPLIT.split(body, maxsplit=1)
        if len(halves) != 2:
            self.errors.add(ParserErrors.MalFormedExpression)
            lo, hi = (halves[0] or "*"), "*"
        else:
            lo, hi = halves[0].strip() or "*", halves[1].strip() or "*"
        self.root = ast.Range(
            low=None if lo == "*" else lo,
            high=None if hi == "*" else hi,
            include_low=open_ch == "[",
            include_high=(close_ch or "]") == "]",
        )
        self.symbol = self.lexer.next_symbol()

    def _process_terminal(self) -> None:
        # tuple membership: `"" in "[{"` is True (empty substring), so a
        # string haystack would route an empty TOKEN into the range path
        if self.symbol == Sym.TOKEN and self.lexer.text[:1] in ("[", "{"):
            self._range_expression()
        elif self.symbol == Sym.TOKEN:
            self.root = ast.Operand(self.lexer.text)
            self.symbol = self.lexer.next_symbol()
        elif self.symbol == Sym.FIELD:
            field_name = self.lexer.text
            self._term()
            self.root = ast.FieldQuery(field_name, self.root)
        elif self.symbol == Sym.LEFT:
            self._or_expression()
            if self.symbol == Sym.EOF:
                self.errors.add(ParserErrors.MissingRightParen)
                return  # missing right parens implicitly inserted
            if self.symbol != Sym.RIGHT:
                self.errors.add(ParserErrors.MissingRightParen)
            self.symbol = self.lexer.next_symbol()
        elif self.symbol == Sym.NOT:
            self._term()
            self.root = ast.Not(self.root)
        elif self.symbol == Sym.QUOTE:
            self._quoted_expression()
        else:
            # malformed: insert the wildcard operand
            self.root = ast.Operand(self.missing)
            self.errors.add(ParserErrors.MalFormedExpression)


def parse_query(
    s: str, missing_token_value: str = "*:*"
) -> tuple[ast.Expression, set[ParserErrors]]:
    parser = RecursiveDescentParser(Lexer(s), missing_token_value)
    tree = parser.parse()
    return tree, parser.errors
