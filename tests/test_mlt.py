"""MLT + unsupervised-feedback behavior tests (SURVEY.md §5.4):
mintf/mindf/maxdf filters, L2 normalization, seed exclusion, and the
seed-MUST + expansion-SHOULD feedback semantics — engine vs a pandas
oracle recomputing the reference formulas directly."""

import math

import numpy as np
import pandas as pd
import pytest

from solrplugins_spark import oracle
from solrplugins_spark.query.mlt import MLTParams, interesting_terms, more_like_this
from solrplugins_spark.query.feedback import unsupervised_feedback
from solrplugins_spark.query.scorer import BM25
from solrplugins_spark.query.compiler import execute_query


def oracle_mlt_terms(oi, seed_ids, p: MLTParams):
    """createQueue + getMostInterestingTerms in pandas
    (MoreLikeThis.java:996-1055, 961-989)."""
    seed = oi.postings[oi.postings["doc_id"].isin(seed_ids)]
    tf = seed.groupby("term")["tf"].sum()
    rows = []
    for term, t in tf.items():
        df = int(oi.df_map[term])
        if p.min_term_freq > 0 and t < p.min_term_freq:
            continue
        if p.min_doc_freq > 0 and df < p.min_doc_freq:
            continue
        if df > p.max_doc_freq:
            continue
        idf = math.log(oi.n_docs / (df + 1.0)) + 1.0
        tv = math.log(t + 1.0) if p.log_tf else float(t)
        w = tv * idf if p.boost else 1.0
        rows.append((term, int(t), df, w))
    cand = pd.DataFrame(rows, columns=["term", "tf", "df", "weight"])
    cand = cand.sort_values(["weight", "term"], ascending=[False, True]).head(
        p.max_query_terms
    )
    veclen = math.sqrt((cand["weight"] ** 2).sum())
    if veclen <= 0:
        return cand.assign(score=0.0).head(0)
    norm = veclen if p.normalize_boosts else 1.0
    cand["score"] = p.field_boost * cand["weight"] / norm
    return cand.reset_index(drop=True)


@pytest.fixture(scope="module")
def oi(tiny_corpus_pd):
    return oracle.build_oracle_index(tiny_corpus_pd)


@pytest.mark.parametrize(
    "params",
    [
        MLTParams(),
        MLTParams(min_term_freq=2, min_doc_freq=2),
        MLTParams(max_doc_freq=50),
        MLTParams(log_tf=True),
        MLTParams(boost=False),
        MLTParams(normalize_boosts=False),
        MLTParams(max_query_terms=5),
        MLTParams(field_boost=3.0),
    ],
)
def test_interesting_terms_vs_oracle(tiny_index, oi, params):
    seeds = [0, 1, 2]
    got = (
        interesting_terms(tiny_index, seeds, params)
        .orderBy("term")
        .toPandas()
    )
    want = oracle_mlt_terms(oi, seeds, params).sort_values("term").reset_index(drop=True)
    assert list(got["term"]) == list(want["term"])
    np.testing.assert_allclose(got["score"], np.round(want["score"], 5), atol=1e-5)
    assert list(got["df"]) == list(want["df"])
    assert list(got["tf"]) == list(want["tf"])


def test_mlt_excludes_seeds(tiny_index):
    seeds = [5, 6]
    got = more_like_this(tiny_index, seeds, MLTParams(), k=20).toPandas()
    assert not set(got["doc_id"]) & set(seeds)
    assert len(got) > 0


def test_mlt_topk_vs_oracle(tiny_index, oi):
    seeds = [10]
    p = MLTParams(max_query_terms=8)
    terms = oracle_mlt_terms(oi, seeds, p)
    boosts = list(zip(terms["term"], terms["score"]))
    scored = oracle.score_query(oi, boosts, BM25)
    scored = scored[~scored["doc_id"].isin(seeds)]
    want = oracle.topk(scored, 10)
    got = more_like_this(tiny_index, seeds, p, k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-4)


def test_feedback_two_phase(tiny_index, oi):
    """seed MUST + expansion SHOULD: result docs all match the seed
    query; scores = seed + expansion partials."""
    q = "zephyrblade"
    p = MLTParams(max_query_terms=10)
    got = unsupervised_feedback(tiny_index, q, k=10, max_seed_docs=5, params=p).toPandas()

    # oracle: phase 1
    seed_scored = oracle.score_query(oi, [("zephyrblade", 1.0)], BM25)
    seed_top = oracle.topk(seed_scored, 5)
    terms = oracle_mlt_terms(oi, list(seed_top["doc_id"]), p)
    boosts = [(t, round(s, 5)) for t, s in zip(terms["term"], terms["score"])]
    exp = oracle.score_query(oi, boosts, BM25)
    exp_map = dict(zip(exp["doc_id"], exp["score"]))
    final = seed_scored.copy()
    final["score"] = final.apply(
        lambda r: r["score"] + exp_map.get(r["doc_id"], 0.0), axis=1
    )
    want = oracle.topk(final, 10)
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-4)
    # every result doc matches the seed query
    assert set(got["doc_id"]) <= set(seed_scored["doc_id"])


def test_feedback_improves_recall_shape(tiny_index):
    """Sanity: feedback returns same count, different/equal ordering."""
    base = execute_query(tiny_index, "quartzowl", k=10).toPandas()
    fb = unsupervised_feedback(tiny_index, "quartzowl", k=10).toPandas()
    assert set(fb["doc_id"]) <= set(
        execute_query(tiny_index, "quartzowl", k=10**6).toPandas()["doc_id"]
    )
    assert len(fb) == len(base)


def test_interesting_terms_many_seeds_size_guard(tiny_index, tiny_corpus_pd):
    """Adversarial seed count (every doc is a seed): the fused top-k
    stage is fed by a distributed per-partition pre-prune; results must
    equal a brute-force pandas computation of the same semantics."""
    import math

    import pandas as pd

    from solrplugins_spark.analysis.tokenizer import tokenize_pandas
    from solrplugins_spark.query.mlt import MLTParams, interesting_terms

    params = MLTParams(min_term_freq=1, min_doc_freq=2, max_query_terms=15)
    seeds = list(tiny_corpus_pd["doc_id"])
    got = interesting_terms(tiny_index, seeds, params).toPandas()
    assert len(got) == 15

    toks = tokenize_pandas(tiny_corpus_pd["text"])
    n = len(tiny_corpus_pd)
    tf: dict[str, int] = {}
    df: dict[str, int] = {}
    for tl in toks:
        for t in tl:
            tf[t] = tf.get(t, 0) + 1
        for t in set(tl):
            df[t] = df.get(t, 0) + 1
    cand = [
        (t, tf[t], df[t], tf[t] * (math.log(n / (df[t] + 1.0)) + 1.0))
        for t in tf
        if tf[t] >= 1 and df[t] >= 2
    ]
    cand.sort(key=lambda r: (-r[3], r[0]))
    top = cand[:15]
    veclen = math.sqrt(sum(w * w for *_, w in top))
    want = {t: round(w / veclen, 5) for t, _, _, w in top}
    got_map = dict(zip(got["term"], got["score"]))
    assert got_map == want


def test_interesting_terms_driver_matches_distributed(spark, tiny_index):
    """The bounded-seed driver-side PQ (the reference's re-analysis
    shape) must be row-identical to the distributed extraction
    pipeline, across param combos."""
    from solrplugins_spark.query.mlt import MLTParams, interesting_terms

    for p in [
        MLTParams(min_doc_freq=2, max_query_terms=10),
        MLTParams(min_doc_freq=1, max_query_terms=5, log_tf=True),
        MLTParams(min_doc_freq=2, max_query_terms=0, normalize_boosts=False),
    ]:
        seeds_list = [0, 3, 7]
        seeds_df = spark.createDataFrame(
            [(d,) for d in seeds_list], "doc_id long"
        )
        a = (
            interesting_terms(tiny_index, seeds_list, p)
            .orderBy("term").toPandas()
        )
        b = (
            interesting_terms(tiny_index, seeds_df, p)
            .orderBy("term").toPandas()
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_like_text_equals_doc_seed_when_text_identical(spark, tiny_index, tiny_corpus_pd):
    """Content-stream MLT (like_text) with EXACTLY a stored doc's text
    must produce the identical interesting-terms queue as seeding with
    that doc (DiceMoreLikeThisHandler.java:184-197 feeds the posted
    text through the same like() accumulation), and the same ranking
    except the seed doc itself is NOT excluded (the posted text never
    entered the index)."""
    from solrplugins_spark.query.mlt import interesting_terms_text, more_like_text

    text0 = tiny_corpus_pd.loc[tiny_corpus_pd["doc_id"] == 0, "text"].iloc[0]
    p = MLTParams(min_doc_freq=2, max_query_terms=20)
    from_text = interesting_terms_text(tiny_index, text0, p).orderBy("term").toPandas()
    from_doc = interesting_terms(tiny_index, [0], p).orderBy("term").toPandas()
    pd.testing.assert_frame_equal(from_text, from_doc)

    top_text = more_like_text(tiny_index, text0, p, k=1000).toPandas()
    top_doc = more_like_this(tiny_index, [0], p, k=1000).toPandas()
    assert 0 in set(top_text["doc_id"])          # not excluded
    assert 0 not in set(top_doc["doc_id"])        # excluded
    merged = top_text[top_text["doc_id"] != 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, top_doc.reset_index(drop=True))


def test_like_text_unknown_terms_skipped(tiny_index):
    """Out-of-corpus words in the pasted text degrade gracefully
    (createQueue skips docFreq==0 terms)."""
    from solrplugins_spark.query.mlt import interesting_terms_text

    out = interesting_terms_text(
        tiny_index, "zzqq xxyy w0000 w0001", MLTParams(min_doc_freq=1)
    ).toPandas()
    assert set(out["term"]) <= {"w0000", "w0001"}
    empty = interesting_terms_text(
        tiny_index, "zzqq xxyy", MLTParams(min_doc_freq=1)
    ).toPandas()
    assert len(empty) == 0


def test_match_query_offset_seed_selection(tiny_index):
    """matchOffset seed-side paging (DiceMoreLikeThisHandler
    .java:199-221): the seed is the match at position `match_offset`
    of q's ranking; past-the-end offsets raise."""
    from solrplugins_spark.query.handlers import match_seed, mlt_handler

    ranked = execute_query(tiny_index, "w0003", k=3).collect()
    for off in range(len(ranked)):
        assert match_seed(tiny_index, "w0003", off) == ranked[off]["doc_id"]
    with pytest.raises(ValueError, match="past the match list"):
        match_seed(tiny_index, "w0003", 10_000_000)
    with pytest.raises(ValueError, match=">= 0"):
        match_seed(tiny_index, "w0003", -1)

    p = MLTParams(min_doc_freq=2, max_query_terms=20)
    via_handler = mlt_handler(
        tiny_index, match_query="w0003", match_offset=1, params=p, k=5
    )["docs"].toPandas()
    direct = more_like_this(
        tiny_index, [int(ranked[1]["doc_id"])], p, k=5
    ).toPandas()
    pd.testing.assert_frame_equal(via_handler, direct)


def test_packed_like_text_and_match_offset_match_flat(
    spark, tiny_index, tiny_corpus, tmp_path
):
    """The packed /mlt handler serves content-stream and matchOffset
    seeds identically to the flat handler."""
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.handlers import mlt_handler, packed_mlt_handler

    idx = tiny_index
    seg = build_segments(
        idx, str(tmp_path / "mltidx"), seg_size=128, groups=2,
        store_cols=["text"],
    )
    p = MLTParams(min_doc_freq=2, max_query_terms=20)
    txt = "w0000 w0001 w0000 w0003"
    flat = mlt_handler(idx, like_text=txt, params=p, k=10)
    packed = packed_mlt_handler(spark, seg, like_text=txt, params=p, k=10)
    pd.testing.assert_frame_equal(
        flat["docs"].toPandas(), packed["docs"].toPandas()
    )
    pd.testing.assert_frame_equal(
        flat["interesting_terms"].orderBy("term").toPandas(),
        packed["interesting_terms"].orderBy("term").toPandas(),
    )

    flat_m = mlt_handler(idx, match_query="w0003", match_offset=2, params=p, k=10)
    packed_m = packed_mlt_handler(
        spark, seg, match_query="w0003", match_offset=2, params=p, k=10
    )
    pd.testing.assert_frame_equal(
        flat_m["docs"].toPandas(), packed_m["docs"].toPandas()
    )
    with pytest.raises(ValueError, match="needs a seed"):
        packed_mlt_handler(spark, seg, params=p, k=10)


def test_packed_mlt_facet_all_null_column(spark, tiny_corpus, tmp_path):
    """Page facets on a stored column that is NULL for every result
    doc must serve a typed column with one NULL group (the docstore's
    recorded DDL supplies the type — pandas inference can't type an
    all-None column and used to crash createDataFrame)."""
    from pyspark.sql import functions as F

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.handlers import packed_mlt_handler

    docs = tiny_corpus.withColumn("lang", F.lit(None).cast("string"))
    idx = build_index(docs).persist()
    seg = build_segments(
        idx, str(tmp_path / "nullfacet"), seg_size=128, groups=2,
        store_cols=["text", "lang"],
    )
    p = MLTParams(min_doc_freq=2, max_query_terms=20)
    out = packed_mlt_handler(
        spark, seg, seed_doc_ids=[0], params=p, k=5, facet_fields=["lang"]
    )
    facet = out["facet_lang"]
    assert dict(facet.dtypes)["lang"] == "string"
    rows = facet.collect()
    assert len(rows) == 1 and rows[0]["lang"] is None
    assert rows[0]["cnt"] == out["docs"].count()
