"""DSIR importance resampling (text/dsir.py) vs a pure-python
reference — featurization (hashed unigrams+bigrams), the smoothed
log-ratio weights, and the Gumbel-top-k resampler's determinism."""

import hashlib
import math

import pandas as pd
import pytest

from solrplugins_spark.analysis.tokenizer import tokenize_pandas
from solrplugins_spark.text.dsir import (
    doc_features,
    dsir_weights,
    importance_resample,
)

N_BUCKETS = 64


def _hash(f: str) -> int:
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _feats(text: str) -> list[int]:
    toks = list(tokenize_pandas(pd.Series([text]))[0])
    fs = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_hash(f) for f in fs]


@pytest.fixture(scope="module")
def dsir_pd():
    rows = [
        (0, "the quick brown fox jumps", "en"),
        (1, "the lazy dog sleeps all day", "en"),
        (2, "le renard brun rapide", "fr"),
        (3, "der schnelle braune fuchs", "de"),
        (4, "quick quick brown brown", "en"),
        (5, "dog fox day quick", "fr"),
        (6, "all sleeps lazy the the", "de"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


@pytest.fixture(scope="module")
def dsir_docs(spark, dsir_pd):
    return spark.createDataFrame(dsir_pd).persist()


def ref_weights(pdf, target_mask):
    raw_counts = [0] * N_BUCKETS
    tgt_counts = [0] * N_BUCKETS
    per_doc: dict[int, list[int]] = {}
    for _, row in pdf.iterrows():
        fs = _feats(row["text"])
        per_doc[row["doc_id"]] = fs
        for b in fs:
            raw_counts[b] += 1
            if target_mask(row):
                tgt_counts[b] += 1
    R, T = sum(raw_counts), sum(tgt_counts)
    lr = [
        math.log((tgt_counts[b] + 1) / (T + N_BUCKETS))
        - math.log((raw_counts[b] + 1) / (R + N_BUCKETS))
        for b in range(N_BUCKETS)
    ]
    return {
        d: round(sum(lr[b] for b in fs), 5) for d, fs in per_doc.items() if fs
    }


def test_doc_features_match_reference_hash(dsir_docs, dsir_pd):
    got = (
        doc_features(dsir_docs, n_buckets=N_BUCKETS)
        .toPandas()
        .groupby("doc_id")["bucket"]
        .apply(sorted)
        .to_dict()
    )
    want = {
        row["doc_id"]: sorted(_feats(row["text"]))
        for _, row in dsir_pd.iterrows()
    }
    assert got == want


def test_dsir_weights_match_reference(spark, dsir_docs, dsir_pd):
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(
            dsir_docs, dsir_docs.filter(F.col("lang") == "en"),
            n_buckets=N_BUCKETS,
        ).collect()
    }
    want = ref_weights(dsir_pd, lambda row: row["lang"] == "en")
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 2e-5, (d, got[d], want[d])
    # en docs must on average score higher than non-en
    en = dsir_pd[dsir_pd["lang"] == "en"]["doc_id"]
    fr = dsir_pd[dsir_pd["lang"] != "en"]["doc_id"]
    assert (
        sum(got[d] for d in en) / len(en)
        > sum(got[d] for d in fr) / len(fr)
    )


def test_target_equals_raw_gives_zero_weights(dsir_docs):
    got = dsir_weights(dsir_docs, dsir_docs, n_buckets=N_BUCKETS).collect()
    assert got and all(r["weight"] == 0.0 for r in got)


def test_importance_resample_deterministic_and_bounded(spark, dsir_docs):
    from pyspark.sql import functions as F

    tgt = dsir_docs.filter(F.col("lang") == "en")
    a = importance_resample(dsir_docs, tgt, k=3, seed=7, n_buckets=N_BUCKETS)
    b = importance_resample(dsir_docs, tgt, k=3, seed=7, n_buckets=N_BUCKETS)
    assert a.collect() == b.collect()
    assert a.count() == 3
    # near-zero temperature degenerates to plain top-k by weight
    cold = importance_resample(
        dsir_docs, tgt, k=3, seed=7, temperature=1e-9, n_buckets=N_BUCKETS
    ).toPandas()
    top = (
        dsir_weights(dsir_docs, tgt, n_buckets=N_BUCKETS)
        .orderBy(F.desc("weight"), F.asc("doc_id")).limit(3).toPandas()
    )
    assert set(cold["doc_id"]) == set(top["doc_id"])
    with pytest.raises(ValueError, match="k > 0"):
        importance_resample(dsir_docs, tgt, k=0)
