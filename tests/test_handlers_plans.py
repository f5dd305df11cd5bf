"""Handler response shapes, boostFn semantics, arrow/JVM tokenizer
cross-check, and physical-plan regression guards."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.analysis.tokenizer import counted_terms
from solrplugins_spark.query.handlers import feedback_handler, mlt_handler
from solrplugins_spark.query.mlt import MLTParams
from solrplugins_spark.query.scorer import search_terms


@pytest.fixture(scope="module")
def handler_corpus(spark):
    rows = [
        (i, f"w{i % 5:04d} common shared w0001", f"cat{i % 2}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, cat string")


@pytest.fixture(scope="module")
def handler_index(handler_corpus):
    from solrplugins_spark.index.builder import build_index

    return build_index(handler_corpus).persist()


def test_mlt_handler_response_shape(handler_index):
    p = MLTParams(min_doc_freq=1)
    out = mlt_handler(
        handler_index, [0], p, k=5, facet_fields=["cat"]
    )
    assert set(out) == {"docs", "interesting_terms", "facet_cat"}
    docs = out["docs"].toPandas()
    assert len(docs) == 5 and 0 not in set(docs["doc_id"])
    terms = out["interesting_terms"].toPandas()
    assert {"term", "tf", "df", "score"} <= set(terms.columns)
    facets = out["facet_cat"].toPandas()
    assert facets["cnt"].sum() == 5  # facet over the RESULT docset


def test_mlt_handler_boost_fn(handler_index):
    """boostFn is multiplicative AFTER clause scoring (BoostedQuery)."""
    p = MLTParams(min_doc_freq=1)
    plain = mlt_handler(handler_index, [0], p, k=40)["docs"].toPandas()
    boosted = mlt_handler(
        handler_index, [0], p, k=40,
        boost_fn=F.when(F.col("doc_id") % 2 == 0, 10.0).otherwise(1.0),
    )["docs"].toPandas()
    pm = dict(zip(plain["doc_id"], plain["score"]))
    bm = dict(zip(boosted["doc_id"], boosted["score"]))
    for d, s in bm.items():
        want = pm[d] * (10.0 if d % 2 == 0 else 1.0)
        assert abs(s - round(want, 5)) < 1e-4


def test_feedback_handler_shape(handler_index):
    out = feedback_handler(handler_index, "w0001", MLTParams(min_doc_freq=1), k=5)
    assert set(out) == {"docs", "interesting_terms"}
    assert len(out["docs"].toPandas()) == 5


def test_arrow_and_jvm_tokenizer_paths_agree(spark, tiny_corpus):
    a = (
        counted_terms(tiny_corpus, arrow=True)
        .select("doc_id", "term", "tf")
        .orderBy("doc_id", "term")
        .toPandas()
    )
    b = (
        counted_terms(tiny_corpus, arrow=False)
        .orderBy("doc_id", "term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---- plan-shape regression guards -----------------------------------
def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_query_plan_shapes(handler_index):
    plan = _plan(search_terms(handler_index, [("w0001", 1.0), ("common", 2.0)], k=10))
    assert "TakeOrderedAndProject" in plan, "top-k must not be a global sort"
    # df is resolved driver-side (Lucene TermStates step) and idf/boost
    # fold into literal maps, so a term-bag query is join-FREE: one
    # pruned postings scan + projection + doc_id agg + top-k.
    assert "Join" not in plan, "term-bag query must compile join-free"
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle (doc_id agg), got {n_exchanges}"


def test_build_plan_no_posting_shuffle(spark, tiny_corpus):
    plan = _plan(counted_terms(tiny_corpus))
    assert "Exchange" not in plan, "per-doc inversion must be shuffle-free"


def test_boosted_search_ranks_after_boost(spark):
    """BoostedQuery semantics: the function boost decides WHICH docs
    make the top-k, not just their order within a pre-boosted top-k
    (MoreLikeThisHelper.java:131-145 wraps before getDocList)."""
    from pyspark.sql import functions as F

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.query.handlers import boosted_search

    # doc 0 scores highest on BM25; doc 3's huge boost must beat it
    rows = [
        (0, "java java java", 1.0),
        (1, "java java filler", 1.0),
        (2, "java filler filler", 1.0),
        (3, "java filler filler", 100.0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, w double")
    idx = build_index(docs)
    got = boosted_search(idx, [("java", 1.0)], boost_fn=F.col("w"), k=2).toPandas()
    assert list(got["doc_id"])[0] == 3  # boost decided the top-1
    assert len(got) == 2


def test_packed_select_handler(spark, tiny_corpus, tmp_path):
    """The full /select response from the packed index alone: ranked
    docs with stored fields + facet counts, no flat corpus access."""
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.compiler import execute_query
    from solrplugins_spark.query.handlers import packed_select_handler

    idx = build_index(tiny_corpus).persist()
    seg = build_segments(
        idx, str(tmp_path / "sel"), seg_size=64, groups=2,
        string_cols=["role"], store_cols=["conv_id", "text"],
    )
    out = packed_select_handler(
        spark, seg, "w0001 and not w0002", k=5, facet_fields=["role"]
    )
    docs = out["docs"].toPandas()
    want = execute_query(idx, "w0001 and not w0002", k=5).toPandas()
    assert list(docs["doc_id"]) == list(want["doc_id"])
    assert list(docs["score"]) == list(want["score"])
    assert {"conv_id", "text"} <= set(docs.columns)
    # stored text matches the corpus rows
    corpus = tiny_corpus.toPandas().set_index("doc_id")
    for _, r in docs.iterrows():
        assert r["text"] == corpus.loc[r["doc_id"], "text"]
    facets = out["facet_role"].toPandas()
    assert facets["cnt"].sum() > 0 and set(facets.columns) == {"role", "cnt"}


def test_packed_mlt_handler_matches_flat(spark, tiny_corpus, tmp_path):
    """/mlt from segment files alone (docstore + termstats sidecar +
    wand_search) is value-identical to the flat mlt_handler."""
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.handlers import packed_mlt_handler
    from solrplugins_spark.query.mlt import MLTParams, more_like_this, interesting_terms

    idx = build_index(tiny_corpus).persist()
    seg = build_segments(
        idx, str(tmp_path / "mlt"), seg_size=64, groups=2,
        store_cols=["text", "role"],
    )
    params = MLTParams(min_term_freq=1, min_doc_freq=2, max_query_terms=15)
    out = packed_mlt_handler(
        spark, seg, [0, 3], params, k=8, facet_fields=["role"]
    )
    want_docs = more_like_this(idx, [0, 3], params, k=8).toPandas()
    got_docs = out["docs"].toPandas()
    assert list(got_docs["doc_id"]) == list(want_docs["doc_id"])
    assert list(got_docs["score"]) == pytest.approx(list(want_docs["score"]))
    # seed docs excluded
    assert not set(got_docs["doc_id"]) & {0, 3}
    want_terms = interesting_terms(idx, [0, 3], params).toPandas()
    got_terms = out["interesting_terms"].toPandas()
    assert list(got_terms["term"]) == list(want_terms["term"])
    assert list(got_terms["score"]) == pytest.approx(list(want_terms["score"]))
    facets = out["facet_role"].toPandas()
    assert facets["cnt"].sum() == len(got_docs)


def test_packed_feedback_handler_matches_flat(spark, tiny_corpus, tmp_path):
    """/uf from segment files alone: seed top-N, extraction, and the
    boosted seed-MUST + expansion-SHOULD final query match the flat
    unsupervised_feedback exactly."""
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.feedback import unsupervised_feedback
    from solrplugins_spark.query.handlers import packed_feedback_handler
    from solrplugins_spark.query.mlt import MLTParams

    idx = build_index(tiny_corpus).persist()
    seg = build_segments(
        idx, str(tmp_path / "uf"), seg_size=64, groups=2, store_cols=["text"],
    )
    params = MLTParams(min_term_freq=1, min_doc_freq=2, max_query_terms=15)
    for query in ["w0001", "w0001 or w0003", "w0001 and not w0002"]:
        out = packed_feedback_handler(
            spark, seg, query, params, k=8, max_seed_docs=4
        )
        want = unsupervised_feedback(
            idx, query, k=8, max_seed_docs=4, params=params
        ).toPandas()
        got = out["docs"].toPandas()
        assert list(got["doc_id"]) == list(want["doc_id"]), query
        assert list(got["score"]) == pytest.approx(list(want["score"])), query


def test_packed_boosted_fn_matches_flat(spark, tiny_corpus, tmp_path):
    """BoostedQuery on the packed path (wand_search boost_fn) ==
    flat boosted_search, for the intrinsic doc_id ValueSource, a
    packed docvalues column, and combined with min_should_match —
    multiplicative boost applied BEFORE ranking on both paths
    (MoreLikeThisHelper.java:131-145)."""
    import numpy as np
    from pyspark.sql import functions as F

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments, wand_search
    from solrplugins_spark.query.handlers import boosted_search

    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    idx = build_index(docs).persist()
    seg = build_segments(
        idx, str(tmp_path / "bfn"), seg_size=64, groups=2,
        value_cols=["n_chars"],
    )
    tb = [("w0001", 2.0), ("w0003", 1.0)]
    cases = [
        (
            ("doc_id", lambda v: np.mod(v, 7.0) + 1.0),
            (F.col("doc_id") % 7 + 1).cast("double"),
            1,
        ),
        (
            ("n_chars", lambda v: 1.0 + np.log1p(v)),
            (F.lit(1.0) + F.log1p(F.col("n_chars"))).cast("double"),
            1,
        ),
        (
            ("n_chars", lambda v: np.mod(v, 5.0) + 1.0),
            (F.col("n_chars") % 5 + 1).cast("double"),
            2,
        ),
    ]
    for spec, col_fn, mm in cases:
        got = wand_search(
            spark, seg, tb, k=8, boost_fn=spec, min_should_match=mm
        ).toPandas()
        want = boosted_search(
            idx, tb, col_fn, k=8, min_should_match=mm
        ).toPandas()
        assert list(got["doc_id"]) == list(want["doc_id"]), spec
        assert list(got["score"]) == pytest.approx(list(want["score"])), spec


def test_packed_boosted_fn_needs_docvalues(spark, tiny_corpus, tmp_path):
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments, wand_search

    idx = build_index(tiny_corpus).persist()
    seg = build_segments(idx, str(tmp_path / "nodv"), seg_size=64, groups=1)
    with pytest.raises(ValueError, match="docvalues"):
        wand_search(
            spark, seg, [("w0001", 1.0)], k=5,
            boost_fn=("n_chars", lambda v: v),
        )


def test_packed_handlers_boost_fn_matches_flat(spark, tiny_corpus, tmp_path):
    """boost_fn (BoostedQuery ValueSource) on the packed /mlt and /uf
    handlers == the flat handlers' _apply_boost_fn — multiplicative
    boost decides the top-k on both paths."""
    import numpy as np
    from pyspark.sql import functions as F

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.handlers import (
        feedback_handler,
        mlt_handler,
        packed_feedback_handler,
        packed_mlt_handler,
    )
    from solrplugins_spark.query.mlt import MLTParams

    idx = build_index(tiny_corpus).persist()
    seg = build_segments(
        idx, str(tmp_path / "bfh"), seg_size=64, groups=2,
        store_cols=["text"],
    )
    params = MLTParams(min_term_freq=1, min_doc_freq=2, max_query_terms=15)
    spec = ("doc_id", lambda v: np.mod(v, 5.0) + 1.0)
    col_fn = (F.col("doc_id") % 5 + 1).cast("double")

    got = packed_mlt_handler(
        spark, seg, [0, 3], params, k=8, boost_fn=spec
    )["docs"].toPandas()
    want = mlt_handler(idx, [0, 3], params, k=8, boost_fn=col_fn)[
        "docs"
    ].toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["score"]) == pytest.approx(list(want["score"]), abs=1e-4)

    got = packed_feedback_handler(
        spark, seg, "w0001 or w0003", params, k=8, max_seed_docs=4,
        boost_fn=spec,
    )["docs"].toPandas()
    want = feedback_handler(
        idx, "w0001 or w0003", params, k=8, max_seed_docs=4,
        boost_fn=col_fn,
    )["docs"].toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["score"]) == pytest.approx(list(want["score"]), abs=1e-4)


def test_packed_select_handler_facet_query_and_stats_sections(
    spark, tiny_corpus, tiny_index, tmp_path
):
    """/select with facet.query + stats.field + stats.facet params:
    each section serves from segment files and matches the flat
    component run on the same query."""
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.components import (
        facet_query_search,
        stats_facet_search,
        stats_search,
    )
    from solrplugins_spark.query.handlers import packed_select_handler

    seg = build_segments(
        tiny_index, str(tmp_path / "selsf"), seg_size=64, groups=2,
        string_cols=["role"], value_cols=["turn_idx"], store_cols=["text"],
    )
    fqs = {"w2": "w0002", "late": "turn_idx:[10 TO 19]"}
    out = packed_select_handler(
        spark, seg, "w0001", k=5,
        facet_queries=fqs, stats_fields=["turn_idx"],
        stats_facet={"turn_idx": "role"},
        stats_percentiles={"turn_idx": [0.5, 0.9]},
    )
    assert {"docs", "facet_queries", "stats_turn_idx",
            "stats_turn_idx_by_role", "percentiles_turn_idx"} <= set(out)
    import pandas as pd

    pd.testing.assert_frame_equal(
        out["facet_queries"].toPandas(),
        facet_query_search(tiny_index, "w0001", fqs).toPandas(),
    )
    vals = tiny_corpus.select("doc_id", "turn_idx", "role")
    pd.testing.assert_frame_equal(
        out["stats_turn_idx"].toPandas(),
        stats_search(tiny_index, "w0001", vals, "turn_idx").toPandas(),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        out["stats_turn_idx_by_role"].toPandas(),
        stats_facet_search(
            tiny_index, "w0001", vals, "turn_idx", "role"
        ).toPandas(),
        check_dtype=False,
    )
    from solrplugins_spark.query.components import stats_percentiles_search

    pd.testing.assert_frame_equal(
        out["percentiles_turn_idx"].toPandas(),
        stats_percentiles_search(
            tiny_index, "w0001", vals, "turn_idx", [0.5, 0.9]
        ).toPandas(),
        check_dtype=False,
    )
