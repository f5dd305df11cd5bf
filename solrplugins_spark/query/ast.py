"""Boolean query AST.

Node set mirrors the reference AST (parsing/ast/: Operand, And, Or,
Not, Quote, FieldQuery — Expression.java / operators/*.java), with the
same ``evaluate()`` rendering used by the reference golden tests
(TestRecursiveDescentParser.java:16-215):
  And  -> "(l AND r)"    Or -> "(l OR r)"    Not -> "NOT child"
  Quote -> '"child"'     FieldQuery -> 'field:(child)'
``evaluate()`` output is the parity surface; compilation to DataFrame
plans lives in compiler.py.
"""

from __future__ import annotations

from dataclasses import dataclass


class Expression:
    def evaluate(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def __str__(self) -> str:
        return self.evaluate()


@dataclass
class Operand(Expression):
    value: str

    def evaluate(self) -> str:
        return self.value


@dataclass
class Or(Expression):
    left: Expression
    right: Expression

    def evaluate(self) -> str:
        return f"({self.left.evaluate()} OR {self.right.evaluate()})"


@dataclass
class And(Expression):
    left: Expression
    right: Expression

    def evaluate(self) -> str:
        return f"({self.left.evaluate()} AND {self.right.evaluate()})"


@dataclass
class Not(Expression):
    child: Expression

    def evaluate(self) -> str:
        return f"NOT {self.child.evaluate()}"


@dataclass
class Quote(Expression):
    """Quoted phrase; ``slop`` is the `"a b"~n` proximity EXTENSION
    (the reference grammar has exact phrases only). Semantics are
    Lucene's ordered SpanNearQuery: terms must appear in phrase order
    and the matched window may contain at most ``slop`` extra
    positions (slop=0 == exact adjacency). This intentionally differs
    from PhraseQuery's sloppy matching, which also admits reordered
    terms at an edit-distance cost."""

    child: Expression
    slop: int = 0

    def evaluate(self) -> str:
        base = f'"{self.child.evaluate()}"'
        return f"{base}~{self.slop}" if self.slop > 0 else base


@dataclass
class FieldQuery(Expression):
    field: str  # includes the trailing ':' (lexer emits it that way)
    child: Expression

    def evaluate(self) -> str:
        return f"{self.field}({self.child.evaluate()})"


@dataclass
class Range(Expression):
    """`[a TO b]` / `{a TO b}` range terminal — an EXTENSION beyond the
    reference grammar (its range test is @Ignore'd,
    TestRecursiveDescentParser.java:36-41; real users want ranges).
    ``None`` bounds are open (`*`). Matches are constant-score (1.0),
    the Lucene ConstantScoreRangeQuery semantic."""

    low: str | None
    high: str | None
    include_low: bool = True
    include_high: bool = True

    def evaluate(self) -> str:
        lo = "*" if self.low is None else self.low
        hi = "*" if self.high is None else self.high
        lb = "[" if self.include_low else "{"
        rb = "]" if self.include_high else "}"
        return f"{lb}{lo} TO {hi}{rb}"
