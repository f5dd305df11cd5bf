"""In-engine quality-classifier training — the GPT-3/PaLM-style data
filter: fit a linear classifier that separates a high-quality target
sample from the raw pool, then score (and optionally Pareto-sample)
every raw document. (Brown et al. 2020 §A; the fastText-classifier
stage of CCNet-descended pipelines.)

Features are the SAME hashed word unigram+bigram buckets DSIR uses
(text/dsir.py doc_features), so one featurization convention serves
both selection methods. The model is logistic regression trained by
deterministic full-batch gradient descent: every iteration is ONE
aggregation — each partition computes its partial gradient over the
(doc, bucket) feature rows with the current weights broadcast as a
plan literal, partials sum tree-style, and the driver applies the
step. The weight vector is n_buckets + 1 doubles (thousands — driver
state, never a shuffle), the feature frame is computed once and
persisted across iterations, and no per-doc data ever reaches the
driver. Fully deterministic: no RNG, fixed iteration count, so the
numpy reference in tests reproduces the trained weights bit-for-bit
(modulo float summation order, bounded by the tolerance tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import doc_features


def _design(
    docs: DataFrame, label: int, n_buckets: int, text_col: str, **tok_kwargs
) -> DataFrame:
    """(doc_id, label, buckets array) — one row per doc, bucket
    multiset as an array (bag-of-features)."""
    return (
        doc_features(docs, n_buckets=n_buckets, text_col=text_col, **tok_kwargs)
        .groupBy("doc_id")
        .agg(F.collect_list("bucket").alias("buckets"))
        .withColumn("label", F.lit(float(label)))
    )


def train_quality_classifier(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 1e-4,
    text_col: str = "text",
    **tok_kwargs,
) -> np.ndarray:
    """Weights (n_buckets + 1: bias last) of a logistic regression
    separating ``target`` (label 1) from ``raw`` (label 0), trained by
    ``iters`` deterministic full-batch gradient steps with L2 decay.

    Per iteration: one mapInPandas partial-gradient pass over the
    persisted design frame + one sum — no shuffle of the features, no
    driver-side data besides the (n_buckets+1)-vector."""
    X = (
        _design(raw, 0, n_buckets, text_col, **tok_kwargs)
        .unionByName(_design(target, 1, n_buckets, text_col, **tok_kwargs))
        .persist()
    )
    n_docs = X.count()
    if n_docs == 0:
        raise ValueError("empty corpus — nothing to train on")
    d = n_buckets + 1
    w = np.zeros(d, np.float64)

    for _ in range(iters):
        w_b = w.copy()

        def partial(pdf_iter, _w=w_b, _d=d):
            grad = np.zeros(_d, np.float64)
            for pdf in pdf_iter:
                for bks, y in zip(pdf["buckets"], pdf["label"]):
                    idx = np.asarray(bks, np.int64)
                    # tf-style counts, L2-normalized (fastText's mean
                    # pooling up to scale), bias appended
                    x = np.bincount(idx, minlength=_d - 1).astype(np.float64)
                    nrm = np.linalg.norm(x)
                    if nrm > 0:
                        x /= nrm
                    z = float(x @ _w[:-1] + _w[-1])
                    p = 1.0 / (1.0 + np.exp(-z))
                    grad[:-1] += (p - y) * x
                    grad[-1] += p - y
            yield pd.DataFrame({"g": [grad.tobytes()]})

        parts = X.mapInPandas(partial, schema="g binary").collect()
        grad = np.zeros(d, np.float64)
        for r in parts:
            grad += np.frombuffer(r["g"], np.float64)
        grad /= n_docs
        grad[:-1] += l2 * w[:-1]
        w = w - lr * grad
    X.unpersist()
    return w


def classifier_scores(
    docs: DataFrame,
    weights: np.ndarray,
    n_buckets: int = 4096,
    text_col: str = "text",
    round_to: int = 5,
    **tok_kwargs,
) -> DataFrame:
    """(doc_id, score): P(quality | doc) under trained weights — one
    featurize pass, weights broadcast in the closure, Arrow-batched
    scoring. The quality-filter scoring pass at corpus scale."""
    w = np.asarray(weights, np.float64)
    d = len(w)

    def score(pdf_iter):
        for pdf in pdf_iter:
            out_ids, out_s = [], []
            for doc_id, bks in zip(pdf["doc_id"], pdf["buckets"]):
                idx = np.asarray(bks, np.int64)
                x = np.bincount(idx, minlength=d - 1).astype(np.float64)
                nrm = np.linalg.norm(x)
                if nrm > 0:
                    x /= nrm
                z = float(x @ w[:-1] + w[-1])
                out_ids.append(doc_id)
                out_s.append(round(1.0 / (1.0 + np.exp(-z)), round_to))
            yield pd.DataFrame({"doc_id": out_ids, "score": out_s})

    feats = (
        doc_features(docs, n_buckets=d - 1, text_col=text_col, **tok_kwargs)
        .groupBy("doc_id")
        .agg(F.collect_list("bucket").alias("buckets"))
    )
    return feats.mapInPandas(score, schema="doc_id long, score double")


def pareto_quality_filter(
    docs: DataFrame,
    weights: np.ndarray,
    alpha: float = 9.0,
    seed: int = 0,
    n_buckets: int = 4096,
    text_col: str = "text",
    **tok_kwargs,
) -> DataFrame:
    """GPT-3's noisy quality threshold: keep a doc iff
    score > 1 - pareto_sample(alpha) — high-scoring docs almost always
    survive, low scorers survive occasionally, preserving tail
    diversity (Brown et al. 2020, Appendix A). Deterministic: the
    Pareto draw is keyed on xxhash64(doc_id, seed), no RNG state.
    One filter over the scored frame; nothing collects."""
    scored = classifier_scores(
        docs, weights, n_buckets=n_buckets, text_col=text_col, **tok_kwargs
    )
    m = F.lit(2**32)
    u = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(int(seed))), m) + 0.5) / m
    # inverse-CDF Pareto(alpha, x_m=1) minus 1: (1-u)^(-1/alpha) - 1
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return scored.filter(F.col("score") > F.lit(1.0) - pareto)
