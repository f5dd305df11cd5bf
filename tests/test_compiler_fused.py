"""Fused boolean evaluation == join algebra, for every tree shape.

The compiler takes the FUSED path (one pruned scan -> one pivoted
groupBy(doc_id) -> column-expression boolean algebra) whenever the
tree holds only term operands + AND/OR/NOT (compiler._fusable).
These tests force the JOIN path on the identical query and assert
row-identical (doc_id, round(score,5)) frames — the fusion is a
physical-plan choice, never a semantics choice.

Reference semantics under test: BooleanQuery clause algebra
(MoreLikeThis.java:1057-1073 MUST, MoreLikeThisHelper.java:149-175
MUST_NOT) — a clause contributes score only when matched, NOT
matches the complement at score 0.
"""

import pandas as pd
import pytest

from solrplugins_spark.query import compiler as comp
from solrplugins_spark.query.compiler import execute_query

# trees chosen to cover: single term, flat AND/OR, mixed precedence,
# NOT under AND (anti-join shape), bare NOT (complement from corpus),
# NOT under OR (complement reachable => corpus docset joins in),
# double negation, multi-token operands (one operand -> several
# analyzed terms), unknown terms, match-all, error-recovered input
QUERIES = [
    "quartzowl",
    "w0003 and w0007",
    "w0003 or quartzowl",
    "w0003 and w0007 or quartzowl",
    "w0003 or w0007 and quartzowl",
    "quartzowl and not w0000",
    "not quartzowl",
    "not (w0003 or quartzowl)",
    "not not quartzowl",
    "w0003 and (w0007 or not quartzowl)",
    "zephyrblade or (quartzowl and not (w0003 and w0007))",
    "Quartzowl AND W0003",  # analyzer lowercases
    "nosuchterm",
    "nosuchterm or quartzowl",
    "nosuchterm and quartzowl",
    "not nosuchterm",
    "*:*",
    "(w0003 or",  # error recovery
]


def _both_paths(tiny_index, q):
    fused = (
        execute_query(tiny_index, q, k=10_000)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    orig = comp._fusable
    comp._fusable = lambda t: False
    try:
        joined = (
            execute_query(tiny_index, q, k=10_000)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        comp._fusable = orig
    return fused, joined


@pytest.mark.parametrize("q", QUERIES)
def test_fused_equals_join_algebra(tiny_index, q):
    fused, joined = _both_paths(tiny_index, q)
    assert len(fused) == len(joined), q
    fused["score"] = fused["score"].round(5)
    joined["score"] = joined["score"].round(5)
    pd.testing.assert_frame_equal(fused, joined, check_dtype=False)


def test_fused_path_actually_taken(tiny_index):
    """Guard the dispatch AND the physical shape: a pure term/AND/OR/
    NOT tree must produce the one-shuffle pivot plan — exactly 1
    Exchange (the groupBy(doc_id)), 0 Joins, codegen HashAggregate
    (partial + final; never ObjectHashAggregate), top-k as
    TakeOrderedAndProject — while a Quote tree must fall back to the
    join algebra."""
    plan = (
        execute_query(tiny_index, "w0003 and w0007 or quartzowl", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert plan.count("HashAggregate") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    from solrplugins_spark.query.parser import parse_query

    tree, _ = parse_query('"w0003 w0007" and quartzowl')
    assert not comp._fusable(tree)
