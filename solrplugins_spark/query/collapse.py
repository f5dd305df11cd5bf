"""Field collapse — Solr's CollapsingQParserPlugin
(`fq={!collapse field=...}`), the serving-tier dedup-to-best the
reference's handlers sit behind in any grouped-results deployment:
keep ONE representative doc per group value (the group's
highest-scoring match), then rank the representatives.

Flat path (this module): scored docset -> join the (doc_id, group)
mapping -> one max_by hash agg per group. The packed twin
(index.segments.wand_collapse_search) reads the group from an ordinal
docvalues stream per segment, so at scale the corpus is never joined
at query time; this path is the oracle-shaped reference
implementation and the route for ad-hoc group columns that were never
packed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .parser import parse_query
from .scorer import BM25, Similarity


def group_search(
    index: InvertedIndex,
    query: str,
    group_df: DataFrame,
    group_col: str,
    k_groups: int = 10,
    group_limit: int = 2,
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """Result grouping — Solr's ``group=true&group.field=...&
    group.limit=n`` (Grouping.java): the top ``k_groups`` groups
    ranked by their best doc (Solr's default group sort), each with
    its top ``group_limit`` members in (score desc, doc_id asc)
    order. Collapse (`collapse_search`) is the n=1 special case.

    Returns (grp_rank, group_col, pos, doc_id, score) ordered by
    (grp_rank, pos).

    Plan at scale: group heads come from ONE max_by hash agg (never a
    window over the match set); the k_groups winners are a
    TakeOrderedAndProject; only the winning groups' members pay the
    per-group ranking window, after a broadcast semi-join on the
    k_groups-row head frame."""
    tree, _errors = parse_query(query)
    scored = compile_ast(index, tree, sim=sim).select(
        "doc_id", F.round("score", round_to).alias("score")
    )
    joined = scored.join(group_df.select("doc_id", group_col), "doc_id")
    winner = F.max_by(
        F.struct("doc_id", "score"),
        F.struct(F.col("score"), (-F.col("doc_id")).alias("nd")),
    )
    heads = (
        joined.groupBy(group_col)
        .agg(winner.alias("w"))
        .orderBy(F.desc("w.score"), F.asc("w.doc_id"))
        .limit(k_groups)
    )
    from pyspark.sql import Window

    ranked_heads = heads.select(
        F.row_number()
        .over(Window.orderBy(F.desc("w.score"), F.asc("w.doc_id")))
        .alias("grp_rank"),
        group_col,
    )
    members = joined.join(F.broadcast(ranked_heads), group_col)
    pos = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        members.select(
            "grp_rank", group_col, pos.alias("pos"), "doc_id", "score"
        )
        .filter(F.col("pos") <= group_limit)
        .orderBy("grp_rank", "pos")
    )


def collapse_search(
    index: InvertedIndex,
    query: str,
    group_df: DataFrame,
    group_col: str,
    k: int = 10,
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """Top-k group representatives for a parsed boolean query.

    Winner per group = (rounded-score desc, doc_id asc) — the same
    deterministic total order every other surface ranks by, so
    collapse(flat) == collapse(packed) exactly.

    Plan at scale: the scored docset (isin-pruned postings scan +
    one hash agg) joins ``group_df`` on doc_id — co-partitionable,
    and only MATCHED docs flow into the join — then ONE max_by hash
    agg (map-side partial combine; at most |groups| rows survive)
    and TakeOrderedAndProject. Never a window function: row_number
    over the match set would sort every group's docs; max_by is a
    single streaming pass.
    """
    tree, _errors = parse_query(query)
    scored = compile_ast(index, tree, sim=sim).select(
        "doc_id", F.round("score", round_to).alias("score")
    )
    joined = scored.join(group_df.select("doc_id", group_col), "doc_id")
    winner = F.max_by(
        F.struct("doc_id", "score"),
        F.struct(F.col("score"), (-F.col("doc_id")).alias("nd")),
    )
    return (
        joined.groupBy(group_col)
        .agg(winner.alias("w"))
        .select(
            group_col,
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.score").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
