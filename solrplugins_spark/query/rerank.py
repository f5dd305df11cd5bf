"""Two-pass re-ranking — Solr's ReRankQParserPlugin
(`rq={!rerank reRankQuery=$rqq reRankDocs=N reRankWeight=w}`): the
base query retrieves, the top N re-score as
``base + w * rerank_score``, the page is served from the re-sorted
prefix. The cheap-retrieval + expensive-rescoring split every
learning-to-rank stack is built around.

Flat path (this module): the base top-N is a TakeOrderedAndProject
(never a global sort); the rerank query's scored docset joins it on
doc_id, so only N rows flow into the combine regardless of how many
docs the rerank query matches. The packed twin
(index.segments.wand_rerank_search) evaluates the rerank tree per
segment against a broadcast N-id allowlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .parser import parse_query
from .scorer import BM25, Similarity


def rerank_search(
    index: InvertedIndex,
    base_query: str,
    rerank_query: str,
    k: int = 10,
    rerank_docs: int = 30,
    weight: float = 1.0,
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """Top-k of the re-sorted top-``rerank_docs`` prefix.

    Combined score = round(base + weight * rerank, round_to), with
    both passes individually rounded first — the same values either
    pass serves on its own, so rerank(w=0) == the base page exactly
    and flat == packed bit-for-bit. Docs in the prefix that the
    rerank query does not match keep their base score (rerank adds
    0, Solr's semantics — the second pass boosts, it never filters).

    ``k`` must be <= ``rerank_docs``: the page is served from the
    reranked prefix; deeper pages belong to the base query's cursor.
    """
    if k > rerank_docs:
        raise ValueError(
            f"rerank serves from the top-{rerank_docs} prefix; page size "
            f"k={k} exceeds it — raise rerank_docs or page the base query"
        )
    base_tree, _ = parse_query(base_query)
    base = (
        compile_ast(index, base_tree, sim=sim)
        .select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(rerank_docs)
    )
    rr_tree, _ = parse_query(rerank_query)
    rr = compile_ast(index, rr_tree, sim=sim).select(
        "doc_id", F.round("score", round_to).alias("rr_score")
    )
    return (
        base.join(rr, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("score")
                + F.lit(float(weight)) * F.coalesce("rr_score", F.lit(0.0)),
                round_to,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
