"""Cross-core join (Solr JoinQParserPlugin) and DisMax
(DisMaxQParserPlugin): constant-score key-set semi-join and
best-field-plus-tie scoring. Brute-force recomputes, flat==packed key
sets, and the tie dial's two endpoints (max / sum) pin the
semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.index.builder import build_index
from solrplugins_spark.index.segments import build_segments
from solrplugins_spark.query.compiler import execute_query
from solrplugins_spark.query.joins import dismax_search, join_query, wand_join_query
from solrplugins_spark.query.scorer import search_terms


@pytest.fixture(scope="module")
def join_segments(tiny_index, tmp_path_factory):
    out = tmp_path_factory.mktemp("joins") / "idx"
    return build_segments(
        tiny_index, str(out), seg_size=128, groups=2, string_cols=["conv_id"]
    )


@pytest.fixture(scope="module")
def hot_terms(tiny_index):
    rows = tiny_index.terms.orderBy(F.desc("df"), F.asc("term")).limit(2).collect()
    return [r["term"] for r in rows]


def test_join_matches_brute(tiny_index, tiny_corpus, tiny_corpus_pd):
    # rare planted term -> few matched docs -> few conversations: the
    # join must genuinely restrict, or the test is vacuous
    q = "zephyrblade"
    got = join_query(
        tiny_index, q, tiny_corpus.select("doc_id", "conv_id"), "conv_id",
        tiny_corpus, "conv_id",
    ).toPandas()
    matched = execute_query(tiny_index, q, k=10**6).toPandas()["doc_id"]
    by_id = tiny_corpus_pd.set_index("doc_id")
    keys = set(by_id.loc[matched, "conv_id"])
    want = sorted(tiny_corpus_pd[tiny_corpus_pd["conv_id"].isin(keys)]["doc_id"])
    assert list(got["doc_id"]) == want
    assert 0 < len(keys) < tiny_corpus_pd["conv_id"].nunique()
    assert len(want) < len(tiny_corpus_pd)


def test_packed_join_matches_flat(spark, tiny_index, tiny_corpus, join_segments):
    q = "zephyrblade"
    flat = join_query(
        tiny_index, q, tiny_corpus.select("doc_id", "conv_id"), "conv_id",
        tiny_corpus, "conv_id",
    ).toPandas()
    packed = wand_join_query(
        spark, join_segments, q, "conv_id", tiny_corpus, "conv_id"
    ).toPandas()
    assert len(flat) > 0
    pd.testing.assert_frame_equal(packed, flat)


def test_join_empty_from_query(tiny_index, tiny_corpus):
    got = join_query(
        tiny_index, "zzznope", tiny_corpus.select("doc_id", "conv_id"), "conv_id",
        tiny_corpus, "conv_id",
    )
    assert got.count() == 0


@pytest.fixture(scope="module")
def field_indexes(spark, tiny_corpus, tiny_index):
    role_idx = build_index(tiny_corpus, text_col="role").persist()
    return {"": tiny_index, "role": role_idx}


def test_dismax_matches_brute(field_indexes, hot_terms):
    from solrplugins_spark.query.scorer import score_terms

    terms = [(hot_terms[0], 1.0), ("user", 1.0)]
    tie = 0.3
    got = dismax_search(field_indexes, terms, k=10, tie=tie).toPandas()

    frames = []
    for fname, idx in field_indexes.items():
        frames.append(score_terms(idx, terms).toPandas()[["doc_id", "term", "partial"]])
    allp = pd.concat(frames, ignore_index=True)
    pt = allp.groupby(["doc_id", "term"])["partial"].agg(["max", "sum"]).reset_index()
    pt["d"] = pt["max"] + tie * (pt["sum"] - pt["max"])
    want = (
        pt.groupby("doc_id")["d"].sum().round(5).reset_index(name="score")
        .sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dismax_tie_zero_is_pure_max(field_indexes, hot_terms):
    """tie=0: a term matching in ONE field only scores identically to
    that field alone."""
    # 'user' appears only in the role field (text tokens are w-words)
    got = dismax_search(field_indexes, [("user", 1.0)], k=10, tie=0.0).toPandas()
    role_only = search_terms(field_indexes["role"], [("user", 1.0)], k=10).toPandas()
    pd.testing.assert_frame_equal(got, role_only)


def test_dismax_tie_one_is_sum(field_indexes, hot_terms):
    """tie=1 degrades to the boosted-OR sum across fields."""
    terms = [(hot_terms[0], 1.0), ("user", 1.0)]
    got = dismax_search(field_indexes, terms, k=10, tie=1.0).toPandas()
    flat_sum = (
        search_terms(field_indexes[""], terms, k=10**6).toPandas()
        .rename(columns={"score": "a"})
        .merge(
            search_terms(field_indexes["role"], terms, k=10**6).toPandas()
            .rename(columns={"score": "b"}),
            on="doc_id", how="outer",
        )
        .fillna(0.0)
    )
    flat_sum["score"] = (flat_sum["a"] + flat_sum["b"]).round(5)
    want = (
        flat_sum.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(10)[["doc_id", "score"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_dismax_requires_fields():
    with pytest.raises(ValueError, match="field index"):
        dismax_search({}, [("x", 1.0)])
