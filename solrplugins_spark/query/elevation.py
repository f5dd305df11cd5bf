"""Query elevation — Solr's QueryElevationComponent (elevate.xml /
`enableElevation=true&forceElevation=true`): editorially pinned docs
take the TOP positions in their configured order, the organic results
follow in score order with the pinned docs removed from their organic
positions. The sponsored-result / editorial-override behavior every
Solr search deployment configures.

Output schema: (rank, doc_id, score, elevated) — rank is 1-based and
total over the page; pinned docs keep their real query score when
they match (0.0 when they don't — forceElevation pins them anyway,
Solr's semantics).

Scale shape: the elevation list is editorial metadata (a handful of
ids), so both passes stay bounded — the organic page is a top-k
fan-out, the pinned scores come from the allowlist kernel
(wand_scores_for_ids) on the packed path or a broadcast join on the
flat path. Nothing about the match set ever crosses the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .parser import parse_query
from .scorer import BM25, Similarity


def _assemble(
    spark,
    elevated_ids: list[int],
    elev_scores: DataFrame,
    organic: DataFrame,
    k: int,
) -> DataFrame:
    """Shared page assembly: pinned rows (given order, real-or-zero
    score) above organic rows (score order, pins removed)."""
    ids = [int(d) for d in elevated_ids]
    n_pin = min(len(ids), k)
    pins = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids[:k])], "doc_id long, rank int"
    )
    pinned = pins.join(elev_scores, "doc_id", "left").select(
        "rank",
        "doc_id",
        F.coalesce("score", F.lit(0.0)).alias("score"),
        F.lit(True).alias("elevated"),
    )
    org = (
        organic.filter(~F.col("doc_id").isin(ids))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(max(k - n_pin, 0))
    )
    # the organic frame is at most k rows here, so the global-order
    # row_number window is a bounded driver-side ranking, not a sort
    # of the match set
    org_ranked = org.select(
        (
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            )
            + F.lit(n_pin)
        ).alias("rank"),
        "doc_id",
        "score",
        F.lit(False).alias("elevated"),
    )
    return pinned.unionByName(org_ranked).orderBy("rank")


def elevation_search(
    index: InvertedIndex,
    query: str,
    elevated_ids: list[int],
    k: int = 10,
    sim: Similarity = BM25,
    round_to: int = 5,
) -> DataFrame:
    """Flat path: one scored-docset DEFINITION feeds both branches —
    the pinned-score lookup (isin on the tiny id list) and the
    organic top-k (TakeOrderedAndProject). The plan executes the
    pruned scan once per branch (no cache is pinned inside a query
    function); both executions are isin/top-k bounded, and the packed
    twin pays the same two passes by design."""
    tree, _errors = parse_query(query)
    scored = compile_ast(index, tree, sim=sim).select(
        "doc_id", F.round("score", round_to).alias("score")
    )
    spark = index.postings.sparkSession
    elev_scores = scored.filter(F.col("doc_id").isin([int(d) for d in elevated_ids]))
    return _assemble(spark, elevated_ids, elev_scores, scored, k)


def wand_elevation_search(
    spark,
    seg_index,
    query: str,
    elevated_ids: list[int],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
) -> DataFrame:
    """Packed path: organic page via the per-segment boolean top-k
    fan-out (over-fetched by |pins| then pin-filtered — exact, pins
    can displace at most |pins| organic rows); pinned scores via the
    allowlist kernel. Two bounded per-segment passes; with the
    broadcast builds of the tiny pin/page local frames the action
    schedules at most 4 Spark jobs, every one k/|pins|-row bounded
    (asserted in tests/test_serving_plans.py)."""
    from ..index.segments import wand_boolean_search, wand_scores_for_ids

    ids = [int(d) for d in elevated_ids]
    organic = wand_boolean_search(
        spark, seg_index, query, k=k + len(ids), k1=k1, b=b, round_to=round_to
    )
    elev_scores = wand_scores_for_ids(
        spark, seg_index, query, ids, k1=k1, b=b, round_to=round_to
    )
    return _assemble(spark, ids, elev_scores, organic, k)
