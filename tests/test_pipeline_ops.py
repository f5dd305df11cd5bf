"""Dedup / ANN / text-analysis / multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_duplicate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_duplicate_pairs,
)
from solrplugins_spark.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    lsh_hyperplane_buckets,
)
from solrplugins_spark.text import (
    fingerprint_md5,
    language_id,
    quality_features,
    rolling_fingerprint,
    token_counts,
)
from solrplugins_spark.multimodal import (
    decode_media,
    extract_features,
    media_table_from_docs,
    sample_frames,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick  brown FOX jumps over the lazy dog!"),  # exact after norm
        (2, "the quick brown fox jumps over the lazy cat"),    # near-dup
        (3, "completely different text about spark sql engines"),
        (4, "totally unrelated words banana apple cherry"),
        (5, "the quick brown fox jumps over the lazy dog"),    # exact
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_duplicates(dup_docs):
    got = exact_duplicates(dup_docs).toPandas()
    assert set(zip(got["canonical_doc_id"], got["dup_doc_id"])) == {(0, 1), (0, 5)}


def test_minhash_signatures_deterministic(dup_docs, spark):
    a = minhash_signatures(dup_docs).orderBy("doc_id").toPandas()
    b = minhash_signatures(dup_docs.repartition(7)).orderBy("doc_id").toPandas()
    assert [list(s) for s in a["sig"]] == [list(s) for s in b["sig"]]
    assert list(a["doc_id"]) == list(b["doc_id"])
    # identical docs -> identical signatures
    sig = a.set_index("doc_id")["sig"]
    assert list(sig[0]) == list(sig[1]) == list(sig[5])


def test_minhash_pairs_find_near_dups(dup_docs):
    # 8 bands of 2 rows: detection prob at jaccard 0.6 is ~97%
    got = minhash_duplicate_pairs(
        dup_docs, num_hashes=16, bands=8, threshold=0.5
    ).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (0, 2) in pairs  # near-dup above 0.5 bigram jaccard
    assert not any(3 in p or 4 in p for p in pairs)
    # verified jaccard values are exact
    j = dict(zip(zip(got["doc_a"], got["doc_b"]), got["jaccard"]))
    assert j[(0, 1)] == 1.0


def test_simhash_properties(dup_docs):
    got = simhash64(dup_docs).toPandas().set_index("doc_id")["simhash"]
    assert got[0] == got[1] == got[5]  # identical token bags
    ham = bin(int(got[0]) ^ int(got[2])).count("1")
    assert ham <= 12  # near-dup stays close
    far = bin(int(got[0]) ^ int(got[3])).count("1")
    assert far > ham


def test_simhash_batch_boundary(spark, dup_docs):
    """Sign-of-sum is not mergeable: a doc whose (doc_id, term) rows
    straddle an Arrow batch boundary must be carried, not finalized
    from a partial group. Force 3-row batches so every doc splits."""
    want = simhash64(dup_docs).toPandas().set_index("doc_id")["simhash"].to_dict()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        got = simhash64(dup_docs).toPandas().set_index("doc_id")["simhash"].to_dict()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want
    # exactly one row per doc (no groupBy(first) paper-over)
    assert len(got) == dup_docs.count()


def test_simhash_pairs(dup_docs):
    got = simhash_duplicate_pairs(dup_docs, max_hamming=0).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert {(0, 1), (0, 5), (1, 5)} <= pairs


def test_ngram_jaccard_pairs(dup_docs):
    got = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.4).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs and (0, 5) in pairs


def test_ngram_cap_dropped_counter(dup_docs):
    from solrplugins_spark.dedup import ngram_cap_dropped

    # cap=2: the shared "quick brown fox"-family 3-grams appear in 4
    # docs (0,1,2,5) -> salted into ceil(4/2)=2 buckets
    got = ngram_cap_dropped(dup_docs, n=3, max_candidates_per_ngram=2).toPandas()
    assert len(got) > 0
    assert (got["salts"] == np.ceil(got["df"] / 2)).all()
    # no ngram exceeds the cap when the cap is huge
    assert ngram_cap_dropped(dup_docs, n=3, max_candidates_per_ngram=100).count() == 0


def test_ngram_salting_keeps_boilerplate_recall(spark):
    """VERDICT r02 #7 fixture: many copies of one doc, far over the
    per-ngram cap. The old first-N truncation orphaned every copy past
    the cap; salted buckets must keep every copy paired and the whole
    clique connected through transitive pairs."""
    from solrplugins_spark.dedup import duplicate_clusters, ngram_jaccard_pairs

    text = "the quick brown fox jumps over the lazy dog again and again today"
    copies = spark.createDataFrame(
        [(i, text) for i in range(200)], "doc_id long, text string"
    )
    pairs = ngram_jaccard_pairs(
        copies, n=3, threshold=0.9, max_candidates_per_ngram=20
    ).persist()
    got = pairs.toPandas()
    seen = set(got["doc_a"]) | set(got["doc_b"])
    assert seen == set(range(200)), f"orphaned copies: {set(range(200)) - seen}"
    clusters = duplicate_clusters(pairs).toPandas()
    assert set(clusters["cluster_id"]) == {0}, "copies split across clusters"


# ---- ANN ------------------------------------------------------------
@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").persist()


def test_cosine_topk_bruteforce(emb):
    row = emb.first()
    q = list(row["embedding"])
    got = cosine_topk_bruteforce(emb, q, k=5).toPandas()
    assert got.iloc[0]["id"] == row["vec_id"]
    assert abs(got.iloc[0]["cosine"] - 1.0) < 1e-4
    assert list(got["cosine"]) == sorted(got["cosine"], reverse=True)


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].to_numpy())
    q = M[7]
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -np.round(cos, 5)))[:10]
    want = list(pdf["vec_id"].to_numpy()[order])
    got = cosine_topk_bruteforce(emb, list(q), k=10).toPandas()
    assert list(got["id"]) == want


def test_lsh_buckets_deterministic_and_recall(emb):
    b1 = lsh_hyperplane_buckets(emb, n_planes=6).orderBy("id").toPandas()
    b2 = lsh_hyperplane_buckets(emb.repartition(5), n_planes=6).orderBy("id").toPandas()
    assert list(b1["bucket"]) == list(b2["bucket"])
    q = list(emb.first()["embedding"])
    exact = set(cosine_topk_bruteforce(emb, q, k=5).toPandas()["id"])
    # random high-dim vectors spread across buckets: use few planes +
    # multiprobe so candidates cover ~3/4 of the corpus -> high recall
    approx = set(cosine_topk_lsh(emb, q, k=5, n_planes=2, multiprobe=2).toPandas()["id"])
    assert len(exact & approx) >= 3
    # the query's own vector is always in its probe bucket
    assert emb.first()["vec_id"] in approx


def test_embedding_near_duplicates(emb, spark):
    # plant an exact duplicate pair — identical vectors share every
    # LSH table's bucket, so detection is certain, not probabilistic
    dup = emb.limit(1).select((F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    with_dup = emb.unionByName(dup)
    got_df = embedding_near_duplicates(with_dup, threshold=0.9999)
    got = got_df.toPandas()
    first_id = emb.first()["vec_id"]
    assert (first_id, first_id + 10000) in set(zip(got["id_a"], got["id_b"]))
    # the 100TB contract: candidates come from a bucket equi-join,
    # never an all-pairs nested-loop/cartesian join
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_plans_have_no_cross_joins(dup_docs, emb):
    """Every dedup pair operator must candidate-generate via an
    equi-join key (bucket / band / shared-ngram) — assert on the
    physical plans."""
    frames = [
        minhash_duplicate_pairs(dup_docs, num_hashes=16, bands=8, threshold=0.5),
        simhash_duplicate_pairs(dup_docs, max_hamming=3),
        ngram_jaccard_pairs(dup_docs, n=3, threshold=0.4),
        embedding_near_duplicates(emb, threshold=0.95),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
        assert "CartesianProduct" not in plan, plan[:2000]


# ---- text analysis --------------------------------------------------
def test_language_id(spark):
    rows = [
        (0, "the cat is in the house and it is warm"),
        (1, "le chat est dans la maison et il est dans le jardin"),
        (2, "der hund ist nicht in der schule und das ist gut"),
        (3, "el perro es grande y la casa es bonita"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = language_id(df).toPandas().set_index("doc_id")["lang_pred"]
    assert got[0] == "en" and got[1] == "fr" and got[2] == "de" and got[3] == "es"
    assert got[4] == "und"


def test_quality_features(spark):
    rows = [(0, "the quick brown fox jumps over the lazy dog " * 3), (1, "x"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = quality_features(df).toPandas().set_index("doc_id")
    assert got.loc[0, "quality_score"] > got.loc[1, "quality_score"]
    assert got.loc[2, "n_tokens_q"] == 0
    assert got.loc[0, "stopword_ratio"] > 0


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "Hello, world! It's 42.")], "doc_id long, text string")
    got = token_counts(df).toPandas().iloc[0]
    assert got["ws_tokens"] == 4
    # hello , world ! it ' s 42 . -> 9 bpe-ish tokens
    assert got["bpe_ish_tokens"] == 9


def test_fingerprints(spark, dup_docs):
    got = fingerprint_md5(dup_docs).toPandas().set_index("doc_id")["fingerprint"]
    assert got[0] == got[1] == got[5]
    assert got[0] != got[2]
    rf = rolling_fingerprint(dup_docs, window=4).toPandas().set_index("doc_id")["fp"]
    assert rf[0] == rf[1] == rf[5]
    rf2 = rolling_fingerprint(dup_docs.repartition(3), window=4).toPandas().set_index("doc_id")["fp"]
    assert dict(rf) == dict(rf2)


# ---- multimodal plumbing --------------------------------------------
def test_multimodal_pipeline(spark, dup_docs):
    media = media_table_from_docs(dup_docs)
    assert media.schema["media"].dataType.typeName() == "binary"
    dec = decode_media(media, decoder="fake", dim=32).toPandas()
    assert all(len(v) == 32 for v in dec["decoded"])
    # determinism: same payload -> same decode
    d = dec.set_index("media_id")["decoded"]
    assert list(d[0]) == list(d[5])
    feats = extract_features(media, dim=32, n_features=8).toPandas()
    assert all(len(v) == 8 for v in feats["features"])
    frames = sample_frames(media, every_ms=250).toPandas()
    assert set(frames[frames["media_id"] == 0]["offset_ms"]) == {0, 250, 500, 750}
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        decode_media(media, decoder="real").collect()


def test_duplicate_clusters(spark):
    """Min-label connected components over pair output: chains merge
    into one cluster labeled by the min doc id."""
    from solrplugins_spark.dedup import duplicate_clusters

    # components: {1,2,3,4} (a chain), {10,11}, singleton edges only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = duplicate_clusters(pairs).toPandas()
    m = dict(zip(got["doc_id"], got["cluster_id"]))
    assert m == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_clusters_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iter must raise, not
    silently return split clusters (ADVICE r02)."""
    from solrplugins_spark.dedup import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(chain, max_iter=2)
    # and with budget it converges to one cluster
    got = duplicate_clusters(chain, max_iter=10).toPandas()
    assert set(got["cluster_id"]) == {0}


def test_joint_model_row_cap(spark):
    """Driver-side model collect is guarded by a hard row cap with an
    actionable error (VERDICT r02 'what's wrong' #4)."""
    from solrplugins_spark.analytics.jointcounts import (
        JointProbabilityModel,
        build_joint_probability_model,
    )

    df = spark.createDataFrame(
        [(f"c{i}", f"l{i % 3}") for i in range(50)], "cat string, lang string"
    )
    old = JointProbabilityModel.MAX_MODEL_ROWS
    JointProbabilityModel.MAX_MODEL_ROWS = 10
    try:
        with pytest.raises(ValueError, match="exceeds 10 rows"):
            build_joint_probability_model(df, "cat", "lang")
    finally:
        JointProbabilityModel.MAX_MODEL_ROWS = old
    # under the cap it builds fine
    m = build_joint_probability_model(df, "lang", "lang")
    assert m.prior("lang", "l0") > 0


def test_knn_join_recall_and_shape(emb, spark):
    """Batch kNN: each query's own vector ranks first; candidates come
    from a bucket equi-join (no queries x corpus nested loop)."""
    from solrplugins_spark.similarity import knn_join

    queries = emb.filter(F.col("vec_id") < 3)
    got_df = knn_join(queries, emb, k=5, n_planes=2, multiprobe=2)
    got = got_df.toPandas()
    assert set(got["query_id"]) == {0, 1, 2}
    for q in (0, 1, 2):
        rows = got[got["query_id"] == q].sort_values("rank")
        assert rows.iloc[0]["id"] == q and rows.iloc[0]["cosine"] >= 0.99999
        assert list(rows["cosine"]) == sorted(rows["cosine"], reverse=True)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---- cleaning ops -----------------------------------------------------

def test_redact_pii(spark):
    from solrplugins_spark.text import redact_pii

    rows = [
        (0, "email me at alice@corp.example.org or 10.1.2.3 now"),
        (1, "call 555-123-4567 or +44 123-456-7890 no pii here?"),
        (2, "nothing sensitive"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = redact_pii(docs).toPandas().set_index("doc_id")
    assert got.loc[0, "n_email"] == 1 and got.loc[0, "n_ipv4"] == 1
    assert "<EMAIL>" in got.loc[0, "redacted"] and "<IPV4>" in got.loc[0, "redacted"]
    assert "alice@" not in got.loc[0, "redacted"]
    assert got.loc[1, "n_phone"] >= 1 and "<PHONE>" in got.loc[1, "redacted"]
    assert got.loc[2, "redacted"] == "nothing sensitive"
    assert got.loc[2, ["n_email", "n_ipv4", "n_phone"]].sum() == 0


def test_repetition_features(spark):
    from solrplugins_spark.text import repetition_features

    rows = [
        (0, "a b a b a b"),      # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
        (1, "w x y z"),          # all distinct
        (2, "solo"),             # < n tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = repetition_features(docs, n=2).toPandas().set_index("doc_id")
    assert abs(got.loc[0, "dup_ngram_frac"] - (1 - 2 / 5)) < 1e-9
    assert abs(got.loc[0, "top_ngram_frac"] - 3 / 5) < 1e-9
    assert got.loc[1, "dup_ngram_frac"] == 0.0
    assert got.loc[2, "dup_ngram_frac"] == 0.0 and got.loc[2, "top_ngram_frac"] == 0.0


def test_contamination_check(spark):
    from solrplugins_spark.text import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),  # identical
            (1, "quick brown fox jumps over a sleeping cat today"),  # partial
            (2, "completely unrelated words fill this entire line"),
        ],
        "doc_id long, text string",
    )
    got = contamination_check(docs, bench, n=5, threshold=0.5).toPandas().set_index("doc_id")
    assert got.loc[0, "contamination"] == 1.0 and bool(got.loc[0, "contaminated"])
    assert 0 < got.loc[1, "contamination"] < 1.0
    assert got.loc[2, "contamination"] == 0.0 and not bool(got.loc[2, "contaminated"])


def test_deterministic_sample_invariance(spark, dup_docs):
    """Sampling is a pure function of (id, seed): identical keep-set
    across repartitionings; different seeds differ; rate ~ fraction."""
    from solrplugins_spark.text import deterministic_sample

    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = set(deterministic_sample(big, 0.3, seed=7).toPandas()["doc_id"])
    b = set(deterministic_sample(big.repartition(13), 0.3, seed=7).toPandas()["doc_id"])
    assert a == b
    c = set(deterministic_sample(big, 0.3, seed=8).toPandas()["doc_id"])
    assert a != c
    assert 0.25 < len(a) / 2000 < 0.35


def test_stratified_sample_rates(spark):
    from solrplugins_spark.text import stratified_sample

    docs = spark.range(0, 3000).selectExpr(
        "id as doc_id", "case when id % 3 = 0 then 'en' else 'fr' end as lang"
    )
    got = stratified_sample(docs, {"en": 1.0, "fr": 0.0}, "lang").toPandas()
    assert set(got["lang"]) == {"en"} and len(got) == 1000


def test_pack_sequences(spark):
    from solrplugins_spark.text import pack_sequences

    rows = [(0, 1000), (1, 1000), (2, 100), (3, 2000)]
    tc = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = pack_sequences(tc, seq_tokens=2048).toPandas().set_index("doc_id")
    assert got.loc[0, "seq_id"] == 0 and got.loc[0, "offset"] == 0
    assert got.loc[1, "seq_id"] == 0 and got.loc[1, "offset"] == 1000
    assert got.loc[2, "seq_id"] == 0 and got.loc[2, "offset"] == 2000
    assert got.loc[3, "seq_id"] == 1 and got.loc[3, "offset"] == 2100 - 2048


def test_pack_sequences_partition_invariant(spark):
    """The two-pass running total is a pure function of the id order —
    identical packing at any parallelism."""
    from solrplugins_spark.text import pack_sequences

    rng = np.random.default_rng(5)
    rows = [(int(i), int(rng.integers(10, 500))) for i in range(700)]
    tc = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = pack_sequences(tc, 2048, partitions=3).toPandas().sort_values("doc_id")
    b = pack_sequences(tc.repartition(17), 2048, partitions=11).toPandas().sort_values("doc_id")
    assert list(a["seq_id"]) == list(b["seq_id"])
    assert list(a["offset"]) == list(b["offset"])
    # global correctness: offsets restart below seq_tokens and seq_id
    # is nondecreasing in doc order
    assert (a["offset"] < 2048).all()
    assert list(a["seq_id"]) == sorted(a["seq_id"])


def test_quality_filter_rules_and_counts(spark):
    """quality_filter: the gate keeps exactly the docs no rule
    rejects, and rule_counts reports each rule's standalone bite."""
    from solrplugins_spark.text import quality_filter

    rows = [
        (0, "one two three four five six seven eight nine ten"),  # keeps
        (1, "hi"),                                                # too few tokens
        (2, "!!!! %%%% ^^^^ &&&& ****"),                          # low alnum
        (3, "a b c d e f g h i j"),                               # mean token too short
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, counts = quality_filter(docs, min_tokens=5)
    assert set(kept.toPandas()["doc_id"]) == {0}
    c = dict(zip(*counts.toPandas()[["rule", "rejected"]].T.values))
    assert c["too_few_tokens"] >= 1
    assert c["low_alnum_ratio"] >= 1
    assert c["mean_token_too_short"] >= 1
    assert set(kept.columns) == {"doc_id", "text"}


def test_ngram_df_no_window_in_plan(dup_docs):
    """VERDICT r03 #1: the per-ngram df must be a hash aggregate (map-
    side partial combine absorbs boilerplate skew), never a Window over
    the raw inverted (doc_id, ng) frame — a window funnels each
    n-gram's whole posting through one task before salting can help."""
    plan = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan


def test_rolling_fingerprint_golden(spark):
    """Golden values captured from the pre-vectorization kernel
    (per-char FNV-1a loops) — the vectorized byte-matrix sweep must be
    bit-identical. Covers: multi-window docs, a doc shorter than the
    window, empty text, all-same-token text, and shift equivalence
    (docs 0/5 share every window of doc 0)."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs right now"),
        (2, "a b c"),
        (3, ""),
        (4, "sameword sameword sameword sameword sameword sameword sameword sameword sameword"),
        (5, "the quick brown fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    golden = {
        4: {0: 417389765242221439, 1: 1281289764353492443, 2: 2151851377401696701,
            3: 0, 4: 7191719456818382008, 5: 417389765242221439},
        8: {0: 1783908375548134547, 1: 2603461094314453598, 2: 2151851377401696701,
            3: 0, 4: 6638372681904771312, 5: 1783908375548134547},
    }
    for w, want in golden.items():
        got = dict(
            rolling_fingerprint(docs, window=w).toPandas().itertuples(index=False)
        )
        assert got == want, (w, got)


def test_duplicate_clusters_checkpoint_modes(spark, tmp_path):
    """The 100-TB deployment choice is API-visible (VERDICT r03 #8):
    reliable checkpointing survives executor churn but needs a
    checkpoint dir; both modes produce identical clusters."""
    from solrplugins_spark.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    local = duplicate_clusters(pairs).toPandas().set_index("doc_id")["cluster_id"]
    with pytest.raises(ValueError, match="checkpoint"):
        duplicate_clusters(pairs, checkpoint="bogus")
    with pytest.raises(ValueError, match="setCheckpointDir"):
        duplicate_clusters(pairs, checkpoint="reliable")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rel = (
        duplicate_clusters(pairs, checkpoint="reliable")
        .toPandas()
        .set_index("doc_id")["cluster_id"]
    )
    assert dict(local) == dict(rel) == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_chunk_documents_window_semantics(spark):
    """Sliding windows: full chunks share exactly `overlap` tokens,
    the tail chunk is shorter, every token is covered, a short doc
    yields one chunk, an empty doc yields none."""
    from solrplugins_spark.text import chunk_documents

    text = " ".join(f"t{i:03d}" for i in range(25))
    docs = spark.createDataFrame(
        [(0, text), (1, "a b c"), (2, "")], "doc_id long, text string"
    )
    got = chunk_documents(docs, max_tokens=10, overlap=4).toPandas()
    d0 = got[got["doc_id"] == 0].sort_values("chunk_id")
    # stride 6: starts 0,6,12,18 (18 <= 25-4-1); chunk 18 covers 18..24
    assert list(d0["chunk_id"]) == [0, 1, 2, 3]
    assert list(d0["n_tokens"]) == [10, 10, 10, 7]
    chunks = [c.split() for c in d0["chunk"]]
    assert chunks[0][6:] == chunks[1][:4]  # consecutive chunks overlap by 4
    assert chunks[-1][-1] == "t024"        # every token covered
    d1 = got[got["doc_id"] == 1]
    assert len(d1) == 1 and d1.iloc[0]["chunk"] == "a b c"
    assert (got["doc_id"] != 2).all()
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_epoch_shard_determinism_and_reshuffle(spark):
    """Same epoch reproduces identical assignment across
    partitionings; a different epoch reshuffles; shards are balanced
    within loose bounds."""
    from solrplugins_spark.text import epoch_shard

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    a = epoch_shard(docs, n_shards=8, epoch=3).toPandas().set_index("doc_id")
    b = (
        epoch_shard(docs.repartition(7), n_shards=8, epoch=3)
        .toPandas()
        .set_index("doc_id")
    )
    assert dict(a["sort_key"]) == dict(b["sort_key"])
    c = epoch_shard(docs, n_shards=8, epoch=4).toPandas().set_index("doc_id")
    assert dict(a["sort_key"]) != dict(c["sort_key"])
    counts = a.groupby("shard").size()
    assert len(counts) == 8 and counts.min() > 20


def test_multimodal_real_decode_wav_and_pgm(spark):
    """The REAL decode path (stdlib codecs): a synthesized 16-bit PCM
    WAV round-trips to its normalized samples and a binary PGM to its
    normalized gradient; compressed payloads still raise the honest
    NotImplementedError; features pool over variable-length real
    decodes."""
    import numpy as np

    from solrplugins_spark.multimodal.media import (
        decode_media,
        extract_features,
        synth_pgm_bytes,
        synth_wav_bytes,
    )

    wav = synth_wav_bytes(n_samples=800, freq=440.0)
    pgm = synth_pgm_bytes(8, 8)
    media = spark.createDataFrame(
        [(0, bytearray(wav), "audio/wav"), (1, bytearray(pgm), "image/x-pgm")],
        "media_id long, media binary, mime string",
    )
    got = decode_media(media, decoder="real").toPandas().set_index("media_id")
    audio = np.asarray(got.loc[0, "decoded"], dtype=np.float32)
    assert len(audio) == 800
    t = np.arange(800) / 16000.0
    want = np.round(0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767.0) / 32768.0
    assert np.allclose(audio, want, atol=1e-4)
    img = np.asarray(got.loc[1, "decoded"], dtype=np.float32)
    assert len(img) == 64
    assert img[0] == 0.0 and abs(img[-1] - 1.0) < 1e-6
    assert np.all(np.diff(img) >= 0)  # gradient is monotone

    feats = extract_features(media, decoder="real", n_features=8).toPandas()
    assert all(len(f) == 8 for f in feats["features"])

    bad = spark.createDataFrame(
        [(2, bytearray(b"\x89PNG\r\n\x1a\n...."), "image/png")],
        "media_id long, media binary, mime string",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|real decode"):
        decode_media(bad, decoder="real").collect()


def test_ivf_trained_centroids_and_recall(emb):
    """Trained spherical-k-means IVF: deterministic across
    partitionings; probing all cells recovers the exact brute-force
    top-k; nprobe<k cells returns a subset ranked exactly."""
    import numpy as np

    from solrplugins_spark.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    c1 = train_ivf_centroids(emb, n_centroids=4, sample_size=256)
    c2 = train_ivf_centroids(emb.repartition(5), n_centroids=4, sample_size=256)
    assert np.allclose(c1, c2), "training must be partition-invariant"
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)

    q = list(emb.first()["embedding"])
    exact = cosine_topk_bruteforce(emb, q, k=5).toPandas()
    all_cells = cosine_topk_ivf(
        emb, q, k=5, centroids=c1, nprobe=4
    ).toPandas()
    assert list(all_cells["id"]) == list(exact["id"])
    assert np.allclose(all_cells["cosine"], exact["cosine"])

    probed = cosine_topk_ivf(emb, q, k=5, centroids=c1, nprobe=1).toPandas()
    # the query's own vector lives in the probed cell -> rank 1 survives
    assert probed.iloc[0]["id"] == exact.iloc[0]["id"]
    assert set(probed["id"]) <= set(
        cosine_topk_bruteforce(emb, q, k=emb.count()).toPandas()["id"]
    )


def test_ivf_materialized_serving_prunes_partitions(spark, emb, tmp_path):
    """The IVF inverted-file contract (VERDICT r04 item #3): serving
    from a write_ivf_index table reads ONLY the nprobe bucket
    directories — partition-pruned probes, never a corpus re-assign.
    Results are identical to the inline path on the same codebook."""
    import numpy as np

    from solrplugins_spark.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_served,
        write_ivf_index,
    )
    from solrplugins_spark.similarity.ann import _ivf_probes

    path = str(tmp_path / "ivf")
    q = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    cents = write_ivf_index(emb, path, n_centroids=8, dim=len(q))

    served = cosine_topk_ivf_served(spark, path, q, k=10, nprobe=3)
    inline = cosine_topk_ivf(emb, q, k=10, centroids=cents, nprobe=3).toPandas()
    got = served.toPandas()
    assert list(got["id"]) == list(inline["id"])
    assert np.allclose(got["cosine"], inline["cosine"])

    # files-read assert: the probe filter must prune at the partition
    # level — the EXECUTED scan's numPartitions metric counts the
    # bucket=... directories actually read; it must equal nprobe while
    # the on-disk inverted file holds strictly more cells
    probes = _ivf_probes(cents, q, 3)
    assert len(probes) == 3
    plan = served._jdf.queryExecution().executedPlan()

    def _walk(node, out):
        out.append(node)
        for i in range(node.children().length()):
            _walk(node.children().apply(i), out)

    nodes = []
    _walk(plan, nodes)
    scan_metrics = {}
    for n in nodes:
        if "Scan" in n.nodeName():
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                scan_metrics[kv._1()] = kv._2().value()
    assert scan_metrics.get("numPartitions") == 3, scan_metrics
    all_buckets = {
        d for d in __import__("os").listdir(path) if d.startswith("bucket=")
    }
    assert len(all_buckets) > 3, "fixture must populate more cells than nprobe"
    # plan-level: the partition filter shows up in the scan node
    assert "PartitionFilters" in plan.toString() and "bucket" in plan.toString()


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2021 ExactSubstr)
# ---------------------------------------------------------------------------


def test_duplicate_spans_golden(spark):
    """Hand-checkable: canonical (min doc_id, min start) occurrence is
    exempt; every other occurrence of a duplicated window reports."""
    from solrplugins_spark.dedup.dedup import duplicate_spans

    rows = [
        (0, "a b c d e f"),
        (1, "x a b c d e y"),
        (2, "unique tokens only here"),
        (3, "a b c d"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        duplicate_spans(df, window=4)
        .orderBy("doc_id", "start")
        .toPandas()
    )
    assert list(map(tuple, got.itertuples(index=False))) == [
        (1, 1, "a b c d"),
        (1, 2, "b c d e"),
        (3, 0, "a b c d"),
    ]


def test_remove_duplicate_spans_golden(spark):
    from solrplugins_spark.dedup.dedup import remove_duplicate_spans

    rows = [
        (0, "a b c d e f"),
        (1, "x a b c d e y"),
        (2, "unique tokens only here"),
        (3, "a b c d"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        remove_duplicate_spans(df, window=4)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(map(tuple, got.itertuples(index=False))) == [
        (0, 6, "a b c d e f"),   # canonical doc: untouched
        (1, 2, "x y"),           # covered positions 1-5 removed
        (2, 4, "unique tokens only here"),
        (3, 0, ""),              # fully covered
        (4, 0, ""),              # empty doc keeps a row
    ]


def test_duplicate_spans_plan_shape(spark):
    """The candidate pass must shuffle 8-byte hashes, not span text:
    the first aggregate groups on the xxhash64 column and the whole
    detection plan carries no python UDF and no cartesian join."""
    from solrplugins_spark.dedup.dedup import duplicate_spans

    rows = [(i, f"t{i} common a b c d e f common") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = duplicate_spans(df, window=4)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


# ---- mixture sampling ---------------------------------------------------


def test_mixture_rates_binding_stratum(spark):
    """The scarcest-relative-to-target stratum keeps rate 1.0; the
    realized expected mixture equals the normalized weights."""
    from solrplugins_spark.text import mixture_rates

    rows = [(i, "a" if i < 300 else ("b" if i < 330 else "c"))
            for i in range(360)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # counts: a=300 b=30 c=30; weights 50/30/20 -> T=min(600,100,150)=100
    rates = mixture_rates(df, {"a": 0.5, "b": 0.3, "c": 0.2})
    assert rates["b"] == pytest.approx(1.0)
    assert rates["a"] == pytest.approx(100 * 0.5 / 300)
    assert rates["c"] == pytest.approx(100 * 0.2 / 30)


def test_mixture_sample_deterministic_and_filtered(spark):
    from solrplugins_spark.text import mixture_sample

    rows = [(i, ["a", "b", "c", "drop"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = mixture_sample(df, {"a": 0.6, "b": 0.3, "c": 0.1}, seed=11)
    pdf = got.toPandas()
    assert set(pdf["source"]) <= {"a", "b", "c"}  # unlisted strata dropped
    again = mixture_sample(df.repartition(17), {"a": 0.6, "b": 0.3, "c": 0.1},
                           seed=11).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(again["doc_id"])
    # binding stratum (c: 100 rows vs target 0.1 -> T=1000 capped by
    # a: 100/0.6=166.7 -> a binds) -- a keeps everything
    assert (pdf["source"] == "a").sum() == 100


def test_mixture_rates_raises_on_empty_stratum(spark):
    from solrplugins_spark.text import mixture_rates

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        mixture_rates(df, {"a": 0.5, "ghost": 0.5})
    with pytest.raises(ValueError):
        mixture_rates(df, {"a": -1.0, "b": 1.0})


def test_mixture_sample_plan_shape(spark):
    """The data path is a pure hash-filter: no shuffle, no join in the
    sampled frame's plan (rates resolve to literals driver-side)."""
    from solrplugins_spark.text import mixture_sample

    rows = [(i, ["a", "b"][i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = (
        mixture_sample(df, {"a": 0.7, "b": 0.3})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_mixture_sample_exact_hash_property(spark):
    """Every kept row satisfies unit_hash(id, seed) < rate_s and every
    dropped in-weights row fails it — the keep set is EXACTLY the hash
    rule, not approximately the target mixture."""
    import hashlib

    from solrplugins_spark.text import mixture_rates, mixture_sample

    rows = [(i, ["a", "b"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"a": 0.8, "b": 0.2}
    rates = mixture_rates(df, weights)
    kept = {r.doc_id for r in mixture_sample(df, weights, seed=7).collect()}

    def u(i):
        return int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8], 16) / 2**32

    for i, src in rows:
        assert (i in kept) == (u(i) < rates[src]), (i, src)


def test_cap_per_stratum_exact_lowest_hash_set(spark):
    """The survivors are EXACTLY the cap lowest md5(capSEED:id) per
    stratum (the salted two-phase rank equals one global rank), and a
    stratum under the cap keeps every row."""
    import hashlib

    from solrplugins_spark.text import cap_per_stratum

    rows = [(i, "big" if i < 80 else "small") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = cap_per_stratum(df, cap=12, seed=3, salts=4).toPandas()

    def h(i):
        return hashlib.md5(f"cap3:{i}".encode()).hexdigest()

    want_big = sorted((i for i, s in rows if s == "big"),
                      key=lambda i: (h(i), i))[:12]
    assert sorted(got[got["source"] == "big"]["doc_id"]) == sorted(want_big)
    assert (got["source"] == "small").sum() == 10  # under cap: keep all


def test_cap_per_stratum_partition_invariant(spark):
    from solrplugins_spark.text import cap_per_stratum

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    one = cap_per_stratum(df, cap=20, seed=9).toPandas()
    two = cap_per_stratum(df.repartition(13), cap=20, seed=9).toPandas()
    assert sorted(one["doc_id"]) == sorted(two["doc_id"])
    assert one.groupby("source")["doc_id"].count().max() <= 20


def test_cap_per_stratum_salted_window_in_plan(spark):
    """Phase 1 ranks within (stratum, _salt): the first Window's
    partition spec must include the salt column so a head stratum
    never funnels into one task's sort."""
    from solrplugins_spark.text import cap_per_stratum

    df = spark.createDataFrame(
        [(i, "only") for i in range(50)], "doc_id long, source string"
    )
    plan = (
        cap_per_stratum(df, cap=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan
    assert plan.count("Window") >= 2  # partial + final rank stages

    with pytest.raises(ValueError):
        cap_per_stratum(df, cap=0)


def test_dedup_lines_canonical_survivor(spark):
    """One canonical (doc_id,pos)-lowest copy of each repeated line
    survives; short lines are exempt everywhere; docs reassemble in
    original order; a doc keeps its row even when gutted."""
    from solrplugins_spark.dedup import dedup_lines

    rows = [
        (0, "intro\ncommon header\nbody zero"),
        (1, "common header\nbody one\n--"),
        (2, "common header\nbody one\n--"),  # fully duplicated vs 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_kept"], r["text"])
        for r in dedup_lines(df, min_chars=3).collect()
    }
    assert got[0] == (3, "intro\ncommon header\nbody zero")
    # doc 0 holds the canonical "common header"; "--" is exempt
    assert got[1] == (2, "body one\n--")
    assert got[2] == (1, "--")  # both long lines lost to docs 0/1
    assert set(got) == {0, 1, 2}


def test_dedup_lines_partition_invariant_and_custom_sep(spark):
    from solrplugins_spark.dedup import dedup_lines

    rows = [(i, f"alpha beta w{i % 5} gamma") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = dedup_lines(df, min_chars=3, sep=" ").toPandas()
    two = dedup_lines(df.repartition(11), min_chars=3, sep=" ").toPandas()
    assert (
        one.sort_values("doc_id").reset_index(drop=True)
        .equals(two.sort_values("doc_id").reset_index(drop=True))
    )
    # alpha/beta/gamma survive once corpus-wide (canonical = doc 0);
    # the 2-char "wN" tokens are under min_chars=3, exempt everywhere
    assert int(one["n_kept"].sum()) == 3 + 100
    first = one.set_index("doc_id").loc[0]
    assert first["text"] == "alpha beta w0 gamma"
    rest = one[one["doc_id"] > 0]
    assert (rest["n_kept"] == 1).all()

    with pytest.raises(ValueError):
        dedup_lines(df, min_chars=-1)
