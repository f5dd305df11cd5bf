"""Index-build invariants: engine stats == pandas oracle stats; docID
mint is dense and order-stable; per-turn text equality under stable
(conv_id, turn_idx) ordering (BASELINE.json per-row invariant)."""

import pandas as pd
from pyspark.sql import functions as F

from solrplugins_spark.corpus import transcripts
from solrplugins_spark.index.builder import build_index, forward_index, mint_doc_ids
from solrplugins_spark.oracle import build_oracle_index


def test_corpus_deterministic_across_parallelism(spark):
    a = transcripts(spark, 2000, partitions=2).orderBy("conv_id", "turn_idx").toPandas()
    b = transcripts(spark, 2000, partitions=7).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_mint_doc_ids_dense_and_stable(spark):
    docs = transcripts(spark, 3000, partitions=5)
    minted = mint_doc_ids(docs).orderBy("doc_id").toPandas()
    assert list(minted["doc_id"]) == list(range(3000))
    # ids follow (conv_id, turn_idx) order
    resorted = minted.sort_values(["conv_id", "turn_idx"], kind="stable")
    assert list(resorted["doc_id"]) == list(range(3000))
    # invariant: per-turn text equality under stable ordering
    direct = (
        transcripts(spark, 3000, partitions=3)
        .orderBy("conv_id", "turn_idx")
        .select("text")
        .toPandas()["text"]
    )
    assert list(minted.sort_values("doc_id")["text"]) == list(direct)


def test_index_stats_match_oracle(spark, tiny_corpus_pd, tiny_index):
    oi = build_oracle_index(tiny_corpus_pd)
    assert tiny_index.n_docs == oi.n_docs
    assert abs(tiny_index.avgdl - oi.avgdl) < 1e-9

    eng_terms = tiny_index.terms.orderBy("term").toPandas()
    ora_terms = oi.terms.sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng_terms.astype({"df": "int64", "cf": "int64"}),
        ora_terms.astype({"df": "int64", "cf": "int64"}),
        check_dtype=False,
    )

    eng_dl = tiny_index.doclen.orderBy("doc_id").toPandas()
    ora_dl = oi.doclen.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(eng_dl, ora_dl, check_dtype=False)


def test_postings_match_oracle(spark, tiny_corpus_pd, tiny_index):
    oi = build_oracle_index(tiny_corpus_pd)
    eng = tiny_index.postings.orderBy("term", "doc_id").toPandas()
    ora = oi.postings.sort_values(["term", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng[["term", "doc_id", "tf"]], ora, check_dtype=False
    )


def test_forward_index(spark, tiny_corpus, tiny_corpus_pd):
    fwd = forward_index(tiny_corpus).orderBy("doc_id").toPandas()
    oi = build_oracle_index(tiny_corpus_pd)
    # doc 0 terms match oracle
    d0 = oi.postings[oi.postings["doc_id"] == 0].sort_values("term")
    got = fwd[fwd["doc_id"] == 0]["terms"].iloc[0]
    assert [(r["term"], r["tf"]) for r in got] == list(zip(d0["term"], d0["tf"]))
    # dl consistent
    dl = dict(zip(fwd["doc_id"], fwd["dl"]))
    for doc, want in oi.dl_map.items():
        assert dl[doc] == want


def test_empty_text_docs_counted_in_n(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b", "", None]})
    idx = build_index(spark.createDataFrame(pdf))
    assert idx.n_docs == 3
    assert idx.doclen.count() == 1


def test_salted_term_agg_matches_direct(spark, tiny_corpus_pd, tiny_index):
    """Explicit head-term salting: two-phase (term, salt) agg must be
    value-identical to the direct dictionary."""
    from solrplugins_spark.index.skew import salted_term_agg

    direct = tiny_index.terms.orderBy("term").toPandas()
    salted = (
        salted_term_agg(tiny_index.postings, n_salts=8)
        .orderBy("term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        direct[["term", "df", "cf"]].reset_index(drop=True),
        salted[["term", "df", "cf"]].reset_index(drop=True),
        check_dtype=False,
    )
    # hot/cold split variant agrees too
    mixed = (
        salted_term_agg(
            tiny_index.postings,
            n_salts=8,
            salt_threshold_df=50,
            terms_df=tiny_index.terms,
        )
        .orderBy("term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        direct[["term", "df", "cf"]].reset_index(drop=True),
        mixed[["term", "df", "cf"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_corpus_term_stats_matches_index_terms(spark, tiny_corpus, tiny_index):
    """The fused one-Arrow-stage dictionary build (corpus_term_stats)
    is row-identical to the postings-derived terms frame, including
    under stopwords and a token cap."""
    from solrplugins_spark.index.builder import corpus_term_stats

    fused = corpus_term_stats(tiny_corpus).orderBy("term").toPandas()
    via_index = tiny_index.terms.orderBy("term").toPandas()
    pd.testing.assert_frame_equal(fused, via_index, check_dtype=False)

    kw = dict(stopwords={"the", "dup"}, max_tokens=5, min_len=2)
    fused2 = corpus_term_stats(tiny_corpus, **kw).orderBy("term").toPandas()
    via2 = (
        build_index(tiny_corpus, **kw).terms.orderBy("term").toPandas()
    )
    pd.testing.assert_frame_equal(fused2, via2, check_dtype=False)
