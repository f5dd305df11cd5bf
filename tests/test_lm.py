"""Bigram-LM quality scoring (text/lm.py): hand-computed smoothing
math, <unk> closure, short-doc dropout, partition invariance, and the
zero-window plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from solrplugins_spark.text.lm import (
    UNK,
    score_bigram_lm,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def ref_docs(spark):
    # counts: "a b" x3, "b a" x2, "a a" x1  (6 bigrams over {a, b})
    rows = [
        (0, "a b a b"),   # bigrams: ab, ba, ab
        (1, "b a a b"),   # bigrams: ba, aa, ab
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_train_counts(ref_docs):
    lm = train_bigram_lm(ref_docs, vocab_size=10, add_k=0.5)
    vocab = {r.term for r in lm.vocab.collect()}
    assert vocab == {"a", "b"}
    c2 = {(r.w1, r.w2): r.c2 for r in lm.bigrams.collect()}
    assert c2 == {("a", "b"): 3.0, ("b", "a"): 2.0, ("a", "a"): 1.0}
    c1 = {r.w1: r.c1 for r in lm.heads.collect()}
    # head counts are bigram-head sums (self-consistent model)
    assert c1 == {"a": 4.0, "b": 2.0}


def test_score_hand_computed(spark, ref_docs):
    lm = train_bigram_lm(ref_docs, vocab_size=10, add_k=0.5)
    docs = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    got = score_bigram_lm(docs, lm).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_bigrams == 2
    # V+1 = 3 (a, b, <unk>); P(b|a) = (3+.5)/(4+1.5), P(a|b) = (2+.5)/(2+1.5)
    want = (math.log(3.5 / 5.5) + math.log(2.5 / 3.5)) / 2.0
    assert r.lm_logp == pytest.approx(round(want, 5), abs=1e-9)


def test_unk_mapping_and_unseen_head(spark, ref_docs):
    # vocab_size=1 keeps only "a" (count 5 vs 4... recount: tokens are
    # a:4, b:4 -> tie broken alphabetically, "a" wins)
    lm = train_bigram_lm(ref_docs, vocab_size=1, add_k=0.5)
    assert [r.term for r in lm.vocab.collect()] == ["a"]
    docs = spark.createDataFrame([(9, "z q")], "doc_id long, text string")
    r = score_bigram_lm(docs, lm).collect()[0]
    # both tokens OOV -> pair (<unk>, <unk>); V+1 = 2
    c2 = {(x.w1, x.w2): x.c2 for x in lm.bigrams.collect()}
    c1 = {x.w1: x.c1 for x in lm.heads.collect()}
    want = math.log(
        (c2.get((UNK, UNK), 0.0) + 0.5) / (c1.get(UNK, 0.0) + 0.5 * 2)
    )
    assert r.lm_logp == pytest.approx(round(want, 5), abs=1e-9)


def test_short_docs_absent(spark, ref_docs):
    lm = train_bigram_lm(ref_docs, vocab_size=10, add_k=0.5)
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id for r in score_bigram_lm(docs, lm).collect()}
    assert got == {3}


def test_partition_invariance(spark, ref_docs):
    lm = train_bigram_lm(ref_docs, vocab_size=10, add_k=0.5)
    docs = spark.createDataFrame(
        [(i, f"a b a b {'x' * (i % 3 + 1)} a") for i in range(40)],
        "doc_id long, text string",
    )
    a = score_bigram_lm(docs, lm).orderBy("doc_id").collect()
    b = score_bigram_lm(docs.repartition(13), lm).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_bigrams, r.lm_logp) for r in a] == [
        (r.doc_id, r.n_bigrams, r.lm_logp) for r in b
    ]


def test_plan_shape(spark, ref_docs):
    """Bigram construction is array-transform only: no Window, no
    cartesian; vocab/head joins broadcast."""
    lm = train_bigram_lm(ref_docs, vocab_size=10, add_k=0.5)
    docs = spark.createDataFrame([(7, "a b a")], "doc_id long, text string")
    plan = score_bigram_lm(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # vocab/head maps ship, never shuffle


def test_ppl_bucket_thresholds_and_ties(spark):
    """k = ceil(p*n)-th smallest VALUE is the threshold; ties on the
    threshold land in the lower bucket."""
    from solrplugins_spark.text.lm import ppl_bucket

    # 6 scores, terciles: k1=ceil(2)=2 -> t0=-4.0, k2=ceil(4)=4 -> t1=-2.0
    rows = [(1, -5.0), (2, -4.0), (3, -3.0), (4, -2.0), (5, -2.0), (6, -1.0)]
    scored = spark.createDataFrame(rows, "doc_id long, lm_logp double")
    got = {
        r.doc_id: r.bucket
        for r in ppl_bucket(scored, fractions=(1 / 3, 2 / 3)).collect()
    }
    # doc 5 ties doc 4's value; t1 is the 4th smallest = -2.0, so BOTH
    # fall <= t1 -> bucket 1 (value comparison, deterministic)
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 2}


def test_ppl_bucket_grouped_and_capped(spark):
    from solrplugins_spark.text.lm import ppl_bucket

    rows = [(i, "g" + str(i % 2), float(-i)) for i in range(1, 41)]
    scored = spark.createDataFrame(rows, "doc_id long, g string, lm_logp double")
    full = ppl_bucket(scored, by="g")
    # per-group bucket sizes are balanced terciles
    sizes = {
        (r.g, r.bucket): r.n
        for r in full.groupBy("g", "bucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for g in ("g0", "g1"):
        assert sum(sizes[(g, b)] for b in (0, 1, 2)) == 20
        assert all(sizes[(g, b)] >= 6 for b in (0, 1, 2))
    # capped thresholds still bucket EVERY row, deterministically
    capped = ppl_bucket(scored, by="g", sample_cap=10, seed=3)
    assert capped.count() == 40
    again = ppl_bucket(scored.repartition(7), by="g", sample_cap=10, seed=3)
    a = {(r.doc_id): r.bucket for r in capped.collect()}
    b = {(r.doc_id): r.bucket for r in again.collect()}
    assert a == b


def test_ppl_bucket_rejects_bad_fractions(spark):
    from solrplugins_spark.text.lm import ppl_bucket

    scored = spark.createDataFrame([(1, -1.0)], "doc_id long, lm_logp double")
    import pytest as _pt

    with _pt.raises(ValueError):
        ppl_bucket(scored, fractions=(0.0, 0.5))
    with _pt.raises(ValueError):
        ppl_bucket(scored, fractions=(0.5, 1.0))


def test_ppl_bucket_plan_shape(spark):
    """Bucketing never sorts the corpus: no Sort/Window/Exchange on
    the scored frame's bucket application — thresholds broadcast."""
    rows = [(i, "g" + str(i % 2), float(-i)) for i in range(1, 31)]
    scored = spark.createDataFrame(rows, "doc_id long, g string, lm_logp double")
    from solrplugins_spark.text.lm import ppl_bucket

    plan = (
        ppl_bucket(scored, by="g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan          # thresholds ship to the data
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan                 # no rank over the corpus
    # the only Sort is inside the threshold agg's array_sort (an
    # expression, not a Sort operator over the scored frame)
    assert "CartesianProduct" not in plan


# ---- tf-idf vectorization ------------------------------------------------


def test_tfidf_vectors_known_values(spark):
    """Hand-computed weights on a 3-doc corpus; per-doc L2 norm is 1."""
    import math

    from solrplugins_spark.text.analysis import tfidf_vectors

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.term): r.weight for r in tfidf_vectors(docs).collect()}
    n = 3.0
    idf = {t: math.log(n / (df + 1.0)) + 1.0 for t, df in
           {"a": 2.0, "b": 1.0, "c": 1.0}.items()}
    raw1 = {"a": math.sqrt(2.0) * idf["a"], "b": 1.0 * idf["b"]}
    l2_1 = math.sqrt(sum(v * v for v in raw1.values()))
    assert got[(1, "a")] == pytest.approx(round(raw1["a"] / l2_1, 6), abs=1e-9)
    assert got[(1, "b")] == pytest.approx(round(raw1["b"] / l2_1, 6), abs=1e-9)
    # empty doc -> no rows
    assert not any(d == 3 for d, _ in got)
    # every doc's vector has unit L2 norm (post-round tolerance)
    for d in (1, 2):
        s = sum(v * v for (dd, _), v in got.items() if dd == d)
        assert s == pytest.approx(1.0, abs=1e-5)


def test_tfidf_min_df_prunes(spark):
    from solrplugins_spark.text.analysis import tfidf_vectors

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {(r.doc_id, r.term) for r in
           tfidf_vectors(docs, min_df=2).collect()}
    assert got == {(1, "a"), (2, "a")}  # singletons pruned


def test_ppl_bucket_monotone_in_score(spark):
    """Within a group, bucket is monotone non-decreasing in score."""
    from solrplugins_spark.text.lm import ppl_bucket

    rows = [(i, "g" + str(i % 3), float(((i * 7919) % 101) - 50))
            for i in range(60)]
    scored = spark.createDataFrame(rows, "doc_id long, g string, lm_logp double")
    got = ppl_bucket(scored, by="g").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append((r.lm_logp, r.bucket))
    for g, pairs in by_g.items():
        pairs.sort()
        buckets = [b for _, b in pairs]
        assert buckets == sorted(buckets), g
