"""Scoring oracle tests (SURVEY.md §5.2): the distributed engine must
be rank-identical (docIDs + scores to 1e-6 rel tol, ties broken by
doc_id asc) with the pure-pandas brute-force scorer, for BM25 and each
Dice similarity variant."""

import numpy as np
import pandas as pd
import pytest

from solrplugins_spark import oracle
from solrplugins_spark.query.scorer import (
    BM25,
    ClassicDice,
    Similarity,
    search_terms,
)
from solrplugins_spark.query.compiler import execute_query
from solrplugins_spark.query.parser import parse_query

VARIANTS = {
    "bm25": BM25,
    "bm25_k1_0.5_b_0.3": Similarity(kind="bm25", k1=0.5, b=0.3),
    "classic": ClassicDice,
    "classic_no_norm": Similarity(kind="classic", use_norm=False),
    "classic_no_tf_no_norm": Similarity(kind="classic", use_tf=False, use_norm=False),
    "classic_no_idf": Similarity(kind="classic", use_idf=False),
    "cosine_like": Similarity(kind="classic", use_norm=False, use_idf=False),
}


@pytest.fixture(scope="module")
def oi(tiny_corpus_pd):
    return oracle.build_oracle_index(tiny_corpus_pd)


def assert_topk_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got["doc_id"]) == list(want["doc_id"]), (
        f"rank mismatch\nengine:\n{got}\noracle:\n{want}"
    )
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)


@pytest.mark.parametrize("name", list(VARIANTS))
def test_single_term_topk_all_variants(tiny_index, oi, name):
    sim = VARIANTS[name]
    got = search_terms(tiny_index, [("w0001", 1.0)], k=10, sim=sim).toPandas()
    want = oracle.topk(oracle.score_query(oi, [("w0001", 1.0)], sim), 10)
    assert_topk_equal(got, want)


def test_planted_rare_term(tiny_index, oi, tiny_corpus_pd):
    got = search_terms(tiny_index, [("zephyrblade", 1.0)], k=10).toPandas()
    want = oracle.topk(oracle.score_query(oi, [("zephyrblade", 1.0)], BM25), 10)
    assert_topk_equal(got, want)
    assert len(got) > 0  # the plant exists


def test_boosted_or_query(tiny_index, oi):
    terms = [("w0000", 2.0), ("w0005", 1.0), ("zephyrblade", 4.0)]
    got = search_terms(tiny_index, terms, k=15).toPandas()
    want = oracle.topk(oracle.score_query(oi, terms, BM25), 15)
    assert_topk_equal(got, want)


def test_min_should_match(tiny_index, oi):
    terms = [("w0001", 1.0), ("w0002", 1.0), ("w0003", 1.0)]
    got = search_terms(tiny_index, terms, k=20, min_should_match=2).toPandas()
    want = oracle.topk(
        oracle.score_query(oi, terms, BM25, min_should_match=2), 20
    )
    assert_topk_equal(got, want)


def test_missing_term_scores_empty(tiny_index):
    got = search_terms(tiny_index, [("nosuchterm", 1.0)], k=10).toPandas()
    assert len(got) == 0


def test_topk_stable_across_partitions(spark, tiny_corpus_pd):
    """Rank identity must hold under different parallelism (the
    distribution hard-part from SURVEY.md §7)."""
    from solrplugins_spark.index.builder import build_index

    a = build_index(spark.createDataFrame(tiny_corpus_pd).repartition(1))
    b = build_index(spark.createDataFrame(tiny_corpus_pd).repartition(13))
    terms = [("w0000", 1.0), ("w0010", 3.0)]
    ga = search_terms(a, terms, k=10).toPandas()
    gb = search_terms(b, terms, k=10).toPandas()
    pd.testing.assert_frame_equal(ga, gb)


# ---- boolean query execution ---------------------------------------
def oracle_boolean(oi, query, k=10):
    """Tiny reference evaluator for the compiled boolean semantics."""
    tree, _ = parse_query(query)
    from solrplugins_spark.query import ast as A
    from solrplugins_spark.analysis.tokenizer import tokenize_pandas

    def ev(node) -> dict[int, float]:
        if isinstance(node, A.Operand):
            if node.value == "*:*":
                return {d: 0.0 for d in oi.dl_map}
            toks = sorted(set(tokenize_pandas(pd.Series([node.value]))[0]))
            s = oracle.score_query(oi, [(t, 1.0) for t in toks], BM25)
            return dict(zip(s["doc_id"], s["score"]))
        if isinstance(node, A.Or):
            l, r = ev(node.left), ev(node.right)
            return {d: l.get(d, 0) + r.get(d, 0) for d in set(l) | set(r)}
        if isinstance(node, A.And):
            if isinstance(node.right, A.Not):
                l, rneg = ev(node.left), ev(node.right.child)
                return {d: v for d, v in l.items() if d not in rneg}
            if isinstance(node.left, A.Not):
                r, lneg = ev(node.right), ev(node.left.child)
                return {d: v for d, v in r.items() if d not in lneg}
            l, r = ev(node.left), ev(node.right)
            return {d: l[d] + r[d] for d in set(l) & set(r)}
        if isinstance(node, A.Not):
            m = ev(node.child)
            return {d: 0.0 for d in oi.dl_map if d not in m}
        raise TypeError(node)

    m = ev(tree)
    s = pd.DataFrame({"doc_id": list(m), "score": list(m.values())})
    return oracle.topk(s, k)


@pytest.mark.parametrize(
    "q",
    [
        "w0001",
        "w0001 w0002 w0003",
        "w0001 and w0002",
        "w0001 and w0002 or w0003",
        "not w0000 and w0001",
        "w0001 and not w0002",
        "zephyrblade or quartzowl",
    ],
)
def test_boolean_queries_vs_oracle(tiny_index, oi, q):
    got = execute_query(tiny_index, q, k=10).toPandas()
    want = oracle_boolean(oi, q, k=10)
    assert_topk_equal(got, want)


def test_classic_coord_querynorm(spark):
    """coord = overlap/maxOverlap, queryNorm = 1/sqrt(sum w^2)
    (DiceDefaultSimilarity.java:64-74) — verified against a brute-force
    pandas computation of the full classic multi-clause score."""
    import math

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.query.scorer import classic_coord_search

    rows = [
        (0, "java sql java ruby"),
        (1, "java python"),
        (2, "sql sql sql"),
        (3, "ruby go rust"),
        (4, "java sql"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs)
    tb = [("java", 1.0), ("sql", 2.0), ("ruby", 0.5)]
    got = classic_coord_search(idx, tb, k=10).toPandas()

    corpus = {d: t.split() for d, t in rows}
    n = len(corpus)
    df = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n / (df[t] + 1.0)) + 1.0 for t, _ in tb}
    qn = 1.0 / math.sqrt(sum((idf[t] * w) ** 2 for t, w in tb))
    want = {}
    for d, toks in corpus.items():
        dl = len(toks)
        s, matched = 0.0, 0
        for t, w in tb:
            tf = toks.count(t)
            if tf:
                matched += 1
                s += math.sqrt(tf) * idf[t] ** 2 * w / math.sqrt(dl)
        if matched:
            want[d] = round((matched / len(tb)) * qn * s, 5)
    got_map = dict(zip(got["doc_id"], got["score"]))
    assert set(got_map) == set(want)
    for d in want:
        assert abs(got_map[d] - want[d]) < 1e-6, (d, got_map[d], want[d])
    # doc 0 matches all 3 clauses -> coord lifts it to the top
    assert got.iloc[0]["doc_id"] == 0
    # toggles off -> plain classic sum (no coord/queryNorm down-weight)
    raw = classic_coord_search(
        idx, tb, k=10, coord=False, query_norm=False
    ).toPandas()
    raw_map = dict(zip(raw["doc_id"], raw["score"]))
    for d in want:
        assert raw_map[d] >= got_map[d]


def test_range_query_compiler(spark):
    """field:[a TO b] compiles to a constant-score DocSet ANDed/ORed
    with scored clauses; exclusive and open bounds honored."""
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.query.compiler import execute_query

    rows = [
        (0, "java sql", 50),
        (1, "java", 150),
        (2, "java", 250),
        (3, "java", 350),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    idx = build_index(docs)

    got = execute_query(idx, "n_chars:[100 TO 300] and java", k=10).toPandas()
    assert set(got["doc_id"]) == {1, 2}
    # constant-score 1.0 + same BM25 partial for both docs (same tf/dl)
    assert got["score"].nunique() == 1

    got = execute_query(idx, "n_chars:{150 TO *} and java", k=10).toPandas()
    assert set(got["doc_id"]) == {2, 3}

    got = execute_query(idx, "n_chars:[* TO 99]", k=10).toPandas()
    assert set(got["doc_id"]) == {0}
    assert list(got["score"]) == [1.0]


def test_duplicate_query_terms_fold(tiny_index):
    """Duplicate SHOULD clauses collapse by summing boosts (the
    literal-map scorer needs unique keys; code-review r03): scores
    equal the single-clause summed-boost query."""
    from solrplugins_spark.query.scorer import search_terms

    a = search_terms(tiny_index, [("w0001", 1.0), ("w0001", 0.5)], k=10).toPandas()
    b = search_terms(tiny_index, [("w0001", 1.5)], k=10).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_byte315_lossy_norm_codec_and_packed_parity(spark, tiny_corpus, tmp_path):
    """Lucene SmallFloat byte315 semantics: quantized norm <= raw norm,
    at most 255 distinct values, exact table round-trip
    (decode(encode(v)) == v for table values), and the packed path
    (wand_search with the lossy sim) is value-identical to flat."""
    import numpy as np
    from pyspark.sql import functions as F

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments, wand_search
    from solrplugins_spark.query.scorer import (
        Similarity,
        byte315_table,
        search_terms,
    )

    tbl = np.asarray(byte315_table())
    assert len(tbl) == 255 and np.all(np.diff(tbl) > 0)
    # Lucene reference values: floatToByte315(1.0f) == 124 and
    # floatToByte315(0.5f) == 120 (dl=4 -> lengthNorm 0.5), so the
    # decode table holds 1.0 and 0.5 at those bytes
    assert tbl[124 - 1] == 1.0
    assert tbl[120 - 1] == 0.5

    with pytest.raises(ValueError, match="classic"):
        Similarity(kind="bm25", lossy_norm=True).score_expr(
            F.lit(1), F.lit(1), F.lit(1), 1.0, 1
        )

    idx = build_index(tiny_corpus).persist()
    lossy = Similarity(kind="classic", lossy_norm=True)
    exact = Similarity(kind="classic")
    term = idx.terms.orderBy(F.desc("df")).first()["term"]
    flat_lossy = search_terms(idx, [(term, 1.0)], k=10, sim=lossy).toPandas()
    flat_exact = search_terms(idx, [(term, 1.0)], k=10, sim=exact).toPandas()
    # quantization truncates -> lossy scores never exceed exact ones
    merged = flat_lossy.merge(flat_exact, on="doc_id", suffixes=("_l", "_e"))
    assert (merged["score_l"] <= merged["score_e"] + 1e-9).all()

    seg = build_segments(idx, str(tmp_path / "lossy"), seg_size=64, groups=2)
    packed = wand_search(spark, seg, [(term, 1.0)], k=10, sim=lossy).toPandas()
    assert list(packed["doc_id"]) == list(flat_lossy["doc_id"])
    assert np.allclose(packed["score"], flat_lossy["score"], atol=1e-9)


def test_explain_terms_reproduces_served_scores(tiny_index):
    """explain_terms (the debugQuery=true surface) must decompose the
    SAME expression search_terms sums: per-doc sum of partials equals
    the served score, and boost*idf*tf_norm*norm multiplies back to
    each partial, across similarity kinds (incl. the byte315 lossy
    norm mode)."""
    from solrplugins_spark.query.scorer import explain_terms

    tb = [("w0001", 2.0), ("w0002", 1.0)]
    for sim in (
        BM25,
        ClassicDice,
        Similarity(kind="classic", lossy_norm=True),
    ):
        exp = explain_terms(tiny_index, tb, sim=sim, round_to=9).toPandas()
        assert len(exp) > 0
        # factors multiply back to the partial
        prod = exp["boost"] * exp["idf"] * exp["tf_norm"] * exp["norm"]
        np.testing.assert_allclose(prod, exp["partial"], rtol=1e-5, atol=1e-8)
        # per-doc sums equal the served ranking scores
        served = search_terms(tiny_index, tb, k=10_000, sim=sim).toPandas()
        agg = exp.groupby("doc_id")["partial"].sum()
        served = served.set_index("doc_id")["score"]
        joined = pd.concat([agg, served], axis=1, join="inner")
        assert len(joined) == len(served)
        np.testing.assert_allclose(
            joined["partial"], joined["score"], rtol=1e-4, atol=1e-4
        )


def test_explain_terms_unknown_terms_empty_schema(tiny_index):
    from solrplugins_spark.query.scorer import explain_terms

    out = explain_terms(tiny_index, [("zzznotaterm", 1.0)])
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "term", "tf", "df", "boost",
        "idf", "tf_norm", "norm", "partial",
    ]
