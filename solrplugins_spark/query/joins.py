"""Cross-core join and multi-field DisMax — two Solr query parsers
the reference's plugins sit alongside in every real deployment:

- `{!join from=f to=t}query` (JoinQParserPlugin): match docs in the
  FROM side, project their join-key values, return the TO-side docs
  holding any of those keys — Solr's constant-score cross-core join.
- DisMax (DisMaxQParserPlugin): each query term scores against EVERY
  field and takes the best field's score plus ``tie`` times the rest
  (tie=0 -> pure max, tie=1 -> sum); per-doc score sums over terms.

Scale shapes: the join's key set is a distinct-projection of the
MATCHED docs only (one hash agg, usually tiny) broadcast into a
semi-join against the TO side — the corpus-sized side is never
shuffled. On the packed tier the FROM side's key set comes from
`wand_facet_search` (per-segment ordinal partials, corpus never
read). DisMax unions the per-field partial frames — each an
isin-pruned postings scan — into one two-level hash agg; no joins,
no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .parser import parse_query
from .scorer import BM25, Similarity, score_terms


def join_query(
    index: InvertedIndex,
    from_query: str,
    from_values_df: DataFrame,
    from_col: str,
    to_df: DataFrame,
    to_col: str,
    sim: Similarity = BM25,
) -> DataFrame:
    """Solr `{!join from=from_col to=to_col}from_query`: TO-side docs
    whose ``to_col`` appears among the ``from_col`` values of the
    FROM-side match set. Constant-score (Solr's join drops scores);
    returns (doc_id) ordered by doc_id."""
    tree, _errors = parse_query(from_query)
    matched = compile_ast(index, tree, sim=sim).select("doc_id")
    keys = (
        matched.join(from_values_df.select("doc_id", from_col), "doc_id")
        .select(F.col(from_col).alias("_k"))
        .distinct()
    )
    return (
        to_df.join(
            F.broadcast(keys), to_df[to_col] == F.col("_k"), "left_semi"
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


def wand_join_query(
    spark,
    seg_index,
    from_query: str,
    from_col: str,
    to_df: DataFrame,
    to_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """The packed-tier join: the FROM side's key set comes straight
    from the ordinal-docvalues facet partials (wand_facet_search) —
    per-segment, vocab-bounded, the FROM corpus never read at query
    time — then the same broadcast semi-join against the TO side."""
    from ..index.segments import wand_facet_search

    keys = (
        wand_facet_search(spark, seg_index, from_query, from_col, k1=k1, b=b)
        .select(F.col(from_col).alias("_k"))
    )
    return (
        to_df.join(
            F.broadcast(keys), to_df[to_col] == F.col("_k"), "left_semi"
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


def dismax_search(
    field_indexes: dict[str, InvertedIndex],
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    tie: float = 0.1,
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """DisMax top-k over multiple fields: per (doc, term),
    ``best_field_score + tie * sum(other fields)``; per doc, the sum
    over query terms. Deterministic (score desc, doc_id asc) output
    like every other surface.

    Plan: one isin-pruned postings scan per field (each with its own
    df/dl/avgdl statistics — the per-field Similarity mechanism),
    union, ONE (doc, term) hash agg for max+sum, ONE doc hash agg,
    TakeOrderedAndProject. No joins, no windows."""
    if not field_indexes:
        raise ValueError("dismax needs at least one field index")
    parts = None
    for fname, idx in field_indexes.items():
        p = score_terms(idx, terms_boosts, sim=sim).select(
            "doc_id", "term", "partial"
        )
        parts = p if parts is None else parts.unionByName(p)
    per_term = parts.groupBy("doc_id", "term").agg(
        F.max("partial").alias("mx"), F.sum("partial").alias("sm")
    )
    dismax = per_term.select(
        "doc_id",
        (F.col("mx") + F.lit(float(tie)) * (F.col("sm") - F.col("mx"))).alias("d"),
    )
    return (
        dismax.groupBy("doc_id")
        .agg(F.round(F.sum("d"), round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
