"""Unsupervised (pseudo-relevance / blind) feedback — the flagship
two-phase query (DiceUnsupervisedFeedbackHandler +
UnsupervisedFeedbackHelper.java:101-131, traced SURVEY.md §3.2):

  1. run the seed query, keep top ``max_seed_docs`` (default 5,
     DiceUnsupervisedFeedbackHandler.java:64)
  2. MLT term extraction over those docs (same engine as /mlt)
  3. final query = seed MUST + expansion SHOULD — candidate set is
     docs matching the seed query; score = seed score + expansion
     partials (UnsupervisedFeedbackHelper.java:110-118)
  4. re-execute -> top-k

Unlike /mlt the seed docs are NOT excluded (the handler re-runs the
query over the full corpus with the same filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .mlt import MLTParams, interesting_terms
from .parser import parse_query
from .scorer import BM25, Similarity, score_terms


def unsupervised_feedback(
    index: InvertedIndex,
    query: str,
    k: int | None = 10,
    max_seed_docs: int = 5,
    params: MLTParams = MLTParams(),
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """``k=None`` returns the full scored frame (no top-k) — callers
    that apply a multiplicative function boost (BoostedQuery) must
    rank AFTER boosting, not re-rank a pre-boosted top-k.

    Job shape: exactly the reference's two driver crossings and no
    more. Lucene's handler collects the seed TopDocs (bounded:
    max_seed_docs ids) and then builds the boosted expansion query
    object from the extracted terms (bounded: max_query_terms rows,
    UnsupervisedFeedbackHelper.java:101-131) before re-searching.
    Mirroring that, this runs three Spark jobs: (1) seed top-k ids —
    which also materializes the persisted seed-scored frame reused by
    the final join; (2) the term-extraction pipeline; (3) the final
    re-execution. Everything in between stays literal (isin-pruned
    postings scans), so no data-dependent broadcast re-executes an
    upstream plan."""
    tree, _ = parse_query(query)
    # the seed query itself compiles to the FUSED one-shuffle plan
    # when the tree allows (compiler._fused); cached here because the
    # final step re-reads it. The final query deliberately stays a
    # join — NOT the fused pivot: the seed MUST side is selective, so
    # sum-agg over expansion partials (map-side combined to one double
    # per doc) joined against the small cached seed frame beats
    # evaluating |seed|+|expansion| pivot columns for every doc that
    # matches ANY term (A/B at sf0.1: join 0.59 s vs fused 0.81 s,
    # while the pure-boolean fusion wins 0.27 s vs 0.43 s).
    seed_scored = compile_ast(index, tree, sim=sim).persist()

    seed_ids = [
        int(r["doc_id"])
        for r in seed_scored.orderBy(
            F.desc(F.round("score", round_to)), F.asc("doc_id")
        )
        .limit(max_seed_docs)
        .collect()
    ]
    rows = interesting_terms(index, seed_ids, params).collect()
    boosts = [(r["term"], float(r["score"])) for r in rows]
    if boosts:
        df_map = {r["term"]: int(r["df"]) for r in rows}
        partials = score_terms(index, boosts, sim=sim, df_map=df_map)
        exp = partials.groupBy("doc_id").agg(
            F.sum("partial").alias("exp_score")
        )
        final = seed_scored.join(exp, "doc_id", "left").fillna(
            {"exp_score": 0.0}
        )
    else:
        final = seed_scored.withColumn("exp_score", F.lit(0.0))
    final = final.select(
        "doc_id",
        F.round(F.col("score") + F.col("exp_score"), round_to).alias("score"),
    )
    if k is None:
        return final
    return final.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
