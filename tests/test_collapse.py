"""Field collapse (Solr CollapsingQParserPlugin, `fq={!collapse
field=...}`): one representative doc per group value — the group's
best (rounded-score desc, doc_id asc) match — then top-k over
representatives. Flat (join + max_by) and packed (per-segment ordinal
winners, vocab-bounded partials) must be rank-identical, through
score ties, across generations, and against a brute-force recompute.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.index.builder import build_index
from solrplugins_spark.index.segments import build_segments, wand_collapse_search
from solrplugins_spark.query.collapse import collapse_search
from solrplugins_spark.query.compiler import execute_query


@pytest.fixture(scope="module")
def hot_query(tiny_index):
    rows = tiny_index.terms.orderBy(F.desc("df"), F.asc("term")).limit(2).collect()
    return f"{rows[0]['term']} or {rows[1]['term']}"


@pytest.fixture(scope="module")
def col_segments(tiny_index, tmp_path_factory):
    out = tmp_path_factory.mktemp("collapse") / "idx"
    return build_segments(
        tiny_index, str(out), seg_size=128, groups=2, string_cols=["tool"]
    )


def _brute_collapse(scored: pd.DataFrame, groups: pd.DataFrame, col: str, k: int):
    j = scored.merge(groups, on="doc_id")
    j = j.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
    best = j.groupby(col, as_index=False).first()
    return (
        best.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)[[col, "doc_id", "score"]]
        .reset_index(drop=True)
    )


def test_flat_collapse_matches_brute_force(tiny_index, tiny_corpus, tiny_corpus_pd, hot_query):
    got = collapse_search(
        tiny_index, hot_query, tiny_corpus.select("doc_id", "tool"), "tool", k=10
    ).toPandas()
    scored = execute_query(tiny_index, hot_query, k=10**6).toPandas()
    want = _brute_collapse(scored, tiny_corpus_pd[["doc_id", "tool"]], "tool", 10)
    pd.testing.assert_frame_equal(got, want)
    # collapse really collapses: one row per group, fewer rows than matches
    assert got["tool"].is_unique and len(scored) > len(got)


def test_packed_collapse_matches_flat(spark, tiny_index, tiny_corpus, col_segments, hot_query):
    flat = collapse_search(
        tiny_index, hot_query, tiny_corpus.select("doc_id", "tool"), "tool", k=10
    ).toPandas()
    packed = wand_collapse_search(
        spark, col_segments, hot_query, "tool", k=10
    ).toPandas()
    assert list(packed["tool"]) == list(flat["tool"])
    assert list(packed["doc_id"]) == list(flat["doc_id"])
    assert np.allclose(packed["score"], flat["score"], atol=1e-9)


def test_collapse_tie_breaks_on_doc_id(spark, tmp_path):
    """Identical docs in one group -> identical scores; the winner must
    be the LOWEST doc_id, on both paths."""
    rows = [(i, "alpha beta", "g1" if i < 6 else "g2") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tool string")
    idx = build_index(docs)
    seg = build_segments(idx, str(tmp_path / "ties"), seg_size=4, groups=2, string_cols=["tool"])
    flat = collapse_search(idx, "alpha", docs.select("doc_id", "tool"), "tool", k=10).toPandas()
    packed = wand_collapse_search(spark, seg, "alpha", "tool", k=10).toPandas()
    for got in (flat, packed):
        assert sorted(got["tool"]) == ["g1", "g2"]
        assert sorted(got["doc_id"]) == [0, 6]


def test_multi_generation_collapse(spark, tiny_corpus_pd, tiny_index, col_segments, hot_query, tmp_path):
    """Two generations (disjoint halves, per-generation ordinal
    dictionaries) collapse to the same winners as the single index."""
    half_a = spark.createDataFrame(tiny_corpus_pd[tiny_corpus_pd["doc_id"] < 200])
    half_b = spark.createDataFrame(tiny_corpus_pd[tiny_corpus_pd["doc_id"] >= 200])
    seg_a = build_segments(
        build_index(half_a), str(tmp_path / "a"), seg_size=64, groups=2, string_cols=["tool"]
    )
    seg_b = build_segments(
        build_index(half_b), str(tmp_path / "b"), seg_size=64, groups=2, string_cols=["tool"]
    )
    single = wand_collapse_search(spark, col_segments, hot_query, "tool", k=10).toPandas()
    multi = wand_collapse_search(spark, [seg_a, seg_b], hot_query, "tool", k=10).toPandas()
    pd.testing.assert_frame_equal(multi, single)


def test_collapse_requires_packed_ordinals(spark, tiny_index, tmp_path):
    seg = build_segments(tiny_index, str(tmp_path / "noord"), seg_size=128, groups=2)
    with pytest.raises(ValueError, match="ordinal docvalues stream"):
        wand_collapse_search(spark, seg, "alpha", "tool", k=10)


def test_collapse_no_matches_is_empty(spark, tiny_index, tiny_corpus, col_segments):
    flat = collapse_search(
        tiny_index, "zzznope", tiny_corpus.select("doc_id", "tool"), "tool", k=10
    )
    packed = wand_collapse_search(spark, col_segments, "zzznope", "tool", k=10)
    assert flat.count() == 0 and packed.count() == 0
