"""DSIR data selection (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", NeurIPS) — select pretraining
documents whose hashed n-gram feature distribution matches a target
domain.

The pipeline: featurize every document as a bag of hashed word
unigrams + bigrams, fit bucketed bag-of-features models on the RAW
pool and on a TARGET sample, score every raw document with the log
importance ratio log p_target(doc)/p_raw(doc), then resample with
Gumbel-perturbed top-k (sampling without replacement proportional to
the importance weights — the paper's estimator).

Scale shape: both models are ONE hash-bucket aggregation each
(n_buckets rows — thousands, never vocabulary-sized), the log-ratio
table broadcasts, and per-doc scoring is explode → broadcast join →
one keyed sum. Two corpus passes total (featurize raw + score), one
target pass; no vocabulary ever reaches the driver. The feature hash
is md5-prefix arithmetic — deliberately engine-portable (the DuckDB
oracle reproduces it bit-for-bit), swap in xxhash64 for raw speed at
deployment if oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.tokenizer import tokens_col


def _bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic feature hash: first 8 md5 hex chars as an int,
    mod n_buckets. Identical in DuckDB:
    CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % n."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def doc_features(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    doc_col: str = "doc_id",
    **tok_kwargs,
) -> DataFrame:
    """(doc_id, bucket) bag-of-features rows — hashed word unigrams +
    bigrams with multiplicity (the DSIR featurization). One JVM
    projection, no shuffle."""
    toks = tokens_col(text_col, **tok_kwargs)
    # size>=2 guard: Spark's sequence(1, 0) DESCENDS, which would
    # fabricate a null bigram for single-token docs
    feats = F.concat(
        F.col("_toks"),
        F.expr(
            "case when size(_toks) >= 2 then "
            "transform(sequence(1, size(_toks) - 1), "
            "i -> concat(_toks[i-1], ' ', _toks[i])) "
            "else array() end"
        ),
    )
    return (
        docs.select(F.col(doc_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select("doc_id", F.explode(feats).alias("f"))
        .select("doc_id", _bucket(F.col("f"), n_buckets).alias("bucket"))
    )


def _bucket_counts(feats: DataFrame) -> DataFrame:
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    round_to: int = 5,
    **tok_kwargs,
) -> DataFrame:
    """(doc_id, weight): per-raw-doc log importance ratio
    sum_f [ log p_target(bucket(f)) - log p_raw(bucket(f)) ] under
    add-1-smoothed bucket unigram models — the DSIR scoring pass.

    Plan: two n_buckets-row aggs (map-side combined), log-ratio table
    derived in one projection and BROADCAST into the scoring join, one
    groupBy(doc_id) sum. Higher weight = more target-like."""
    raw_f = doc_features(
        raw, n_buckets=n_buckets, text_col=text_col, **tok_kwargs
    )
    tgt_f = doc_features(
        target, n_buckets=n_buckets, text_col=text_col, **tok_kwargs
    )
    # the two bucket models COLLECT (n_buckets rows — thousands) and
    # the log-ratio table re-enters the plan as a LOCAL frame: the
    # scoring job below carries no count lineage, so raw is featurized
    # exactly twice (counts + scoring) and the target once — the
    # documented pass count, with no persisted state to leak and no
    # recompute-on-action surprises
    import math

    spark = raw.sparkSession
    rc = {r["bucket"]: r["cnt"] for r in _bucket_counts(raw_f).collect()}
    tc = {r["bucket"]: r["cnt"] for r in _bucket_counts(tgt_f).collect()}
    R, T = sum(rc.values()), sum(tc.values())
    ratios = spark.createDataFrame(
        [
            (
                b,
                math.log((tc.get(b, 0) + 1.0) / (T + n_buckets))
                - math.log((rc.get(b, 0) + 1.0) / (R + n_buckets)),
            )
            for b in range(n_buckets)
        ],
        "bucket long, lr double",
    )
    return (
        raw_f.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), round_to).alias("weight"))
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    seed: int = 0,
    temperature: float = 1.0,
    n_buckets: int = 4096,
    text_col: str = "text",
    **tok_kwargs,
) -> DataFrame:
    """DSIR's sampling-without-replacement: top-k documents by
    weight/temperature + Gumbel(0,1) noise — equivalent to sampling k
    docs with probability proportional to exp(weight/temperature)
    (the Gumbel-top-k trick), fully deterministic under ``seed``
    (noise keyed on xxhash64(doc_id, seed), no RNG state).

    The ranking is one TakeOrdered over the weights frame — no corpus
    sort; at 10^12 docs this is the same bounded top-k every search
    surface uses."""
    if k <= 0:
        raise ValueError("importance_resample needs k > 0")
    w = dsir_weights(
        raw, target, n_buckets=n_buckets, text_col=text_col, **tok_kwargs
    )
    m = F.lit(2**32)
    u = (
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(int(seed))), m) + 0.5) / m
    )
    gumbel = -F.log(-F.log(u))
    key = F.col("weight") / F.lit(float(temperature)) + gumbel
    return (
        w.select("doc_id", "weight", key.alias("_g"))
        .orderBy(F.desc("_g"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "weight")
    )
