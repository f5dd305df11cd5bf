"""Two-pass re-ranking (Solr ReRankQParserPlugin): base query
retrieves, the top-reRankDocs prefix re-scores as
base + weight * rerank_score, the page serves from the re-sorted
prefix. Flat and packed must agree bit-for-bit, weight=0 must
reproduce the base page, non-matching rerank queries must be no-ops,
and the second pass must actually reorder when it fires."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.index.builder import build_index
from solrplugins_spark.index.segments import build_segments, wand_rerank_search
from solrplugins_spark.query.compiler import execute_query
from solrplugins_spark.query.rerank import rerank_search


@pytest.fixture(scope="module")
def rr_segments(tiny_index, tmp_path_factory):
    out = tmp_path_factory.mktemp("rerank") / "idx"
    return build_segments(tiny_index, str(out), seg_size=128, groups=2)


@pytest.fixture(scope="module")
def queries(tiny_index):
    rows = tiny_index.terms.orderBy(F.desc("df"), F.asc("term")).limit(3).collect()
    t0, t1, t2 = (r["term"] for r in rows)
    return f"{t0} or {t1}", t2


def _brute(tiny_index, base_q, rr_q, k, n, w):
    base = execute_query(tiny_index, base_q, k=n).toPandas()
    rr = execute_query(tiny_index, rr_q, k=10**6).toPandas().rename(
        columns={"score": "rrs"}
    )
    j = base.merge(rr, on="doc_id", how="left").fillna({"rrs": 0.0})
    j["score"] = (j["score"] + w * j["rrs"]).round(5)
    return (
        j.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)[["doc_id", "score"]]
        .reset_index(drop=True)
    )


def test_flat_rerank_matches_brute_force(tiny_index, queries):
    base_q, rr_q = queries
    got = rerank_search(
        tiny_index, base_q, rr_q, k=10, rerank_docs=30, weight=2.0
    ).toPandas()
    want = _brute(tiny_index, base_q, rr_q, k=10, n=30, w=2.0)
    pd.testing.assert_frame_equal(got, want)


def test_rerank_actually_reorders(tiny_index, queries):
    """The fixture terms co-occur, so the second pass must change the
    page relative to the plain base top-10 — otherwise the gate is
    vacuous."""
    base_q, rr_q = queries
    base = execute_query(tiny_index, base_q, k=10).toPandas()
    got = rerank_search(
        tiny_index, base_q, rr_q, k=10, rerank_docs=30, weight=2.0
    ).toPandas()
    assert list(got["doc_id"]) != list(base["doc_id"])


def test_packed_rerank_matches_flat(spark, tiny_index, rr_segments, queries):
    base_q, rr_q = queries
    flat = rerank_search(
        tiny_index, base_q, rr_q, k=10, rerank_docs=30, weight=2.0
    ).toPandas()
    packed = wand_rerank_search(
        spark, rr_segments, base_q, rr_q, k=10, rerank_docs=30, weight=2.0
    ).toPandas()
    assert list(packed["doc_id"]) == list(flat["doc_id"])
    assert np.allclose(packed["score"], flat["score"], atol=1e-9)


def test_zero_weight_is_base_page(spark, tiny_index, rr_segments, queries):
    base_q, rr_q = queries
    base = execute_query(tiny_index, base_q, k=10).toPandas()
    for got in (
        rerank_search(tiny_index, base_q, rr_q, k=10, rerank_docs=30, weight=0.0).toPandas(),
        wand_rerank_search(spark, rr_segments, base_q, rr_q, k=10, rerank_docs=30, weight=0.0).toPandas(),
    ):
        pd.testing.assert_frame_equal(got, base)


def test_nonmatching_rerank_is_noop(spark, tiny_index, rr_segments, queries):
    base_q, _ = queries
    base = execute_query(tiny_index, base_q, k=10).toPandas()
    for got in (
        rerank_search(tiny_index, base_q, "zzznope", k=10, rerank_docs=30, weight=3.0).toPandas(),
        wand_rerank_search(spark, rr_segments, base_q, "zzznope", k=10, rerank_docs=30, weight=3.0).toPandas(),
    ):
        pd.testing.assert_frame_equal(got, base)


def test_page_beyond_prefix_raises(spark, tiny_index, rr_segments, queries):
    base_q, rr_q = queries
    with pytest.raises(ValueError, match="prefix"):
        rerank_search(tiny_index, base_q, rr_q, k=50, rerank_docs=30)
    with pytest.raises(ValueError, match="prefix"):
        wand_rerank_search(spark, rr_segments, base_q, rr_q, k=50, rerank_docs=30)


def test_empty_base_is_empty(spark, tiny_index, rr_segments):
    assert rerank_search(tiny_index, "zzznope", "alpha", k=5).count() == 0
    assert wand_rerank_search(spark, rr_segments, "zzznope", "alpha", k=5).count() == 0
