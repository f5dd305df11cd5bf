"""Naive Bayes classification over tokenized fields.

Reference: NaiveBayesComponent.java:213-242 —
  score(class) = log(prior(class)) + sum over doc tokens of
                 log(termFreq * p(token|class))
with termFreq variants: raw tf, binary (tf -> 1), logTf (ln(tf+1));
zero tf skipped; top-N classes by score (:432-441, topN default 1
:51). Model = smoothed joint/priors over (token, class) counts,
rebuilt on TTL expiry (:386-388) — here a deterministic job.

Spark shape: the model is a broadcast conditional table; classify =
explode doc terms -> broadcast join conditionals -> groupBy(doc,
class) log-sum — one shuffle on doc_id x class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.tokenizer import counted_terms


def naive_bayes_model(
    docs: DataFrame,
    class_col: str,
    text_col: str = "text",
    doc_col: str = "doc_id",
    alpha: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """Returns (priors, conditionals).

    priors:       (cls, prior_cnt, prior_p)   p = (cnt+a)/sum(cnt+a)
    conditionals: (term, cls, cond_p)         p(token|cls) =
                  (joint_cnt+a)/(prior_cnt+a) — the model's
                  joint/prior ratio with add-alpha smoothing.
    Both are class/vocab-bounded (broadcastable).
    """
    ct = counted_terms(docs.select(doc_col, text_col, class_col), doc_col=doc_col,
                       text_col=text_col)
    labeled = ct.join(
        docs.select(F.col(doc_col).alias("doc_id"), F.col(class_col).alias("cls")),
        "doc_id",
    )
    # doc-level counts (a doc contributes 1 to each (term, cls) it contains)
    joints = labeled.groupBy("term", "cls").agg(F.count(F.lit(1)).alias("joint_cnt"))
    prior_cnt = docs.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("prior_cnt")
    )
    total = prior_cnt.agg(F.sum(F.col("prior_cnt") + alpha).alias("t"))
    priors = prior_cnt.crossJoin(F.broadcast(total)).select(
        "cls",
        "prior_cnt",
        ((F.col("prior_cnt") + alpha) / F.col("t")).alias("prior_p"),
    )
    # densify: EVERY (model term, class) pair gets a smoothed value —
    # an unobserved pair must contribute the alpha penalty, not be
    # skipped (JointProbabilityModel.getJoint returns smoothValue for
    # unobserved keys). Vocab x classes is broadcast-sized.
    vocab = joints.select("term").distinct()
    dense = vocab.crossJoin(F.broadcast(priors.select("cls", "prior_cnt")))
    conditionals = (
        dense.join(joints, ["term", "cls"], "left")
        .fillna({"joint_cnt": 0})
        .select(
            "term",
            "cls",
            ((F.col("joint_cnt") + alpha) / (F.col("prior_cnt") + alpha)).alias(
                "cond_p"
            ),
        )
    )
    return priors, conditionals


def naive_bayes_classify(
    docs: DataFrame,
    priors: DataFrame,
    conditionals: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    top_n: int = 1,
    binary: bool = False,
    log_tf: bool = False,
) -> DataFrame:
    """(doc_id, cls, score, rank) — top-N classes per doc.

    Tokens absent from the model contribute nothing (their smoothed
    conditional would be constant across classes up to prior counts;
    the reference skips zero-tf terms and unknown tokens similarly).
    """
    ct = counted_terms(docs.select(doc_col, text_col), doc_col=doc_col, text_col=text_col)
    if binary:
        tf = F.lit(1.0)
    elif log_tf:
        tf = F.log(F.col("tf") + 1.0)
    else:
        tf = F.col("tf").cast("double")
    scored = (
        ct.join(F.broadcast(conditionals), "term")
        .withColumn("_contrib", F.log(tf * F.col("cond_p")))
        .groupBy("doc_id", "cls")
        .agg(F.sum("_contrib").alias("_loglik"))
        .join(F.broadcast(priors.select("cls", "prior_p")), "cls")
        .withColumn("score", F.log("prior_p") + F.col("_loglik"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "cls", "score", "rank")
    )
