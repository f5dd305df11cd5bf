"""Quality-classifier training (text/classifier.py) vs a numpy
reference running the identical deterministic full-batch GD — weights,
scores, and the Pareto filter's determinism."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from solrplugins_spark.analysis.tokenizer import tokenize_pandas
from solrplugins_spark.text.classifier import (
    classifier_scores,
    pareto_quality_filter,
    train_quality_classifier,
)

N_BUCKETS = 64


def _feats(text: str) -> list[int]:
    toks = list(tokenize_pandas(pd.Series([text]))[0])
    fs = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % N_BUCKETS
        for f in fs
    ]


@pytest.fixture(scope="module")
def clf_pd():
    rows = [
        (0, "clean prose with proper sentences and structure", 1),
        (1, "well written text about interesting topics", 1),
        (2, "thoughtful analysis with clear structure", 1),
        (3, "buy now click here cheap deals deals deals", 0),
        (4, "zzz qqq xxx spam spam spam click click", 0),
        (5, "deals deals cheap cheap now now now", 0),
        (6, "clear prose and thoughtful topics", 0),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text", "is_target"])


@pytest.fixture(scope="module")
def clf_docs(spark, clf_pd):
    return spark.createDataFrame(clf_pd).persist()


def _xrow(text: str) -> np.ndarray:
    x = np.bincount(
        np.asarray(_feats(text), np.int64), minlength=N_BUCKETS
    ).astype(np.float64)
    n = np.linalg.norm(x)
    return x / n if n > 0 else x


def ref_train(pdf, iters, lr, l2):
    # raw pool = ALL docs (label 0), target = is_target docs (label 1)
    rows = [( _xrow(r["text"]), 0.0) for _, r in pdf.iterrows()] + [
        (_xrow(r["text"]), 1.0)
        for _, r in pdf.iterrows()
        if r["is_target"] == 1
    ]
    X = np.stack([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    w = np.zeros(N_BUCKETS + 1)
    for _ in range(iters):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.concatenate([X.T @ (p - y), [np.sum(p - y)]]) / len(y)
        g[:-1] += l2 * w[:-1]
        w = w - lr * g
    return w


def test_train_matches_numpy_reference(spark, clf_docs, clf_pd):
    from pyspark.sql import functions as F

    tgt = clf_docs.filter(F.col("is_target") == 1)
    got = train_quality_classifier(
        clf_docs, tgt, n_buckets=N_BUCKETS, iters=30, lr=0.5, l2=1e-4
    )
    want = ref_train(clf_pd, iters=30, lr=0.5, l2=1e-4)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_scores_separate_target_from_junk(spark, clf_docs, clf_pd):
    from pyspark.sql import functions as F

    tgt = clf_docs.filter(F.col("is_target") == 1)
    w = train_quality_classifier(
        clf_docs, tgt, n_buckets=N_BUCKETS, iters=100, lr=1.0
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in classifier_scores(clf_docs, w, n_buckets=N_BUCKETS).collect()
    }
    # reference scoring agrees
    for _, row in clf_pd.iterrows():
        z = _xrow(row["text"]) @ w[:-1] + w[-1]
        assert abs(scores[row["doc_id"]] - 1 / (1 + math.exp(-z))) < 1e-5
    tgt_mean = clf_pd[clf_pd["is_target"] == 1]["doc_id"].map(scores).mean()
    junk = clf_pd[clf_pd["doc_id"].isin([3, 4, 5])]["doc_id"].map(scores).mean()
    assert tgt_mean > junk + 0.1


def test_pareto_filter_deterministic_and_quality_biased(spark, clf_docs, clf_pd):
    from pyspark.sql import functions as F

    tgt = clf_docs.filter(F.col("is_target") == 1)
    w = train_quality_classifier(
        clf_docs, tgt, n_buckets=N_BUCKETS, iters=100, lr=1.0
    )
    a = pareto_quality_filter(
        clf_docs, w, alpha=9.0, seed=11, n_buckets=N_BUCKETS
    ).toPandas()
    b = pareto_quality_filter(
        clf_docs, w, alpha=9.0, seed=11, n_buckets=N_BUCKETS
    ).toPandas()
    pd.testing.assert_frame_equal(a, b)
    kept = set(a["doc_id"])
    assert kept <= set(clf_pd["doc_id"])
    # every kept doc satisfies the documented threshold rule exactly
    scores = {
        r["doc_id"]: r["score"]
        for r in classifier_scores(clf_docs, w, n_buckets=N_BUCKETS).collect()
    }
    # recompute the keyed pareto draw via Spark and check the
    # documented threshold rule doc-by-doc
    spark_draw = (
        clf_docs.select(
            "doc_id",
            (
                F.pow(
                    F.lit(1.0)
                    - (
                        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(11)), F.lit(2**32)) + 0.5)
                        / F.lit(2**32)
                    ),
                    F.lit(-1.0 / 9.0),
                )
                - F.lit(1.0)
            ).alias("p"),
        )
        .toPandas()
        .set_index("doc_id")["p"]
    )
    for d, s in scores.items():
        assert (d in kept) == (s > 1.0 - spark_draw[d]), d
