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
from .compiler import (
    _eval_tree,
    _fusable,
    _leaf_terms,
    _zero_term_match,
    compile_ast,
)
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
    seed_terms = sorted(set(_leaf_terms(tree)))
    fused = bool(seed_terms) and _fusable(tree)
    seed_scored = compile_ast(index, tree, sim=sim)
    if not fused:
        # reused by the final join below — cache once
        seed_scored = seed_scored.persist()

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
    if fused:
        # final query in ONE scan + ONE shuffle: partials over the
        # UNION of seed + expansion terms (all at boost 1.0), per-doc
        # term->partial map, then seed-tree matched/score via the same
        # column-expression evaluator the compiler uses, expansion
        # weights applied as literals (partial(w) = w * partial(1)).
        # No persist, no join — replaces cache-write + shuffle-join of
        # the seed frame against the expansion aggregate.
        all_terms = sorted(set(seed_terms) | {t for t, _ in boosts})
        partials = score_terms(
            index, [(t, 1.0) for t in all_terms], sim=sim
        )
        agg = partials.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "partial"))
            ).alias("_tp")
        )
        if _zero_term_match(tree):
            # a NOT under OR (or bare) makes the complement reachable:
            # docs with none of the terms can match the seed query
            agg = index.doclen.select("doc_id").join(agg, "doc_id", "left")
        matched, seed_score = _eval_tree(tree, F.col("_tp"))
        exp_score = F.lit(0.0)
        for t, w in boosts:
            exp_score = exp_score + F.lit(float(w)) * F.coalesce(
                F.element_at(F.col("_tp"), F.lit(t)), F.lit(0.0)
            )
        final = agg.filter(matched).select(
            "doc_id",
            F.round(seed_score + exp_score, round_to).alias("score"),
        )
    else:
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
