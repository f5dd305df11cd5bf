"""Feature extraction + decision-stump rule learning (filter suggester).

Reference:
- FeatureExtractor.java:108-118 — features = doc terms with df >= minDf
- PartitionObjective.java:17-33 — entropy of a label partition:
  -sum p ln p over label counts
- DecisionStumpLearner.java:11-50 — one stump per feature:
  (feature, most frequent class in its partition, objective score,
  partition size), ranked by (score asc, partition size desc).

Spark shape: one explode + two hash aggs; the entropy is a grouped
column expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.tokenizer import counted_terms


def entropy_expr(cnt_col: str, total_col: str):
    """-p*ln(p) summand; aggregate with F.sum over the group."""
    p = F.col(cnt_col) / F.col(total_col)
    return -(p * F.log(p))


def extract_features(
    docs: DataFrame,
    terms_df: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, feature): distinct doc terms with df >= min_df
    (FeatureExtractor.java:108-118)."""
    ct = counted_terms(docs.select(doc_col, text_col), doc_col=doc_col, text_col=text_col)
    eligible = terms_df.filter(F.col("df") >= min_df).select("term")
    return ct.join(F.broadcast(eligible), "term").select(
        "doc_id", F.col("term").alias("feature")
    )


def learn_stumps(
    features: DataFrame,  # (doc_id, feature)
    labels: DataFrame,    # (doc_id, label)
    top_k: int | None = None,
) -> DataFrame:
    """(feature, predicted, entropy, size) ranked (entropy asc, size
    desc, feature asc) — DecisionStumpLearner.learnRules."""
    dist = (
        features.join(labels, "doc_id")
        .groupBy("feature", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).persist()
    totals = dist.groupBy("feature").agg(F.sum("cnt").alias("size"))
    ent = (
        dist.join(totals, "feature")
        .withColumn("_e", entropy_expr("cnt", "size"))
        .groupBy("feature")
        .agg(F.sum("_e").alias("entropy"))
    )
    best = dist.groupBy("feature").agg(F.max(F.struct("cnt", "label")).alias("_b"))
    out = (
        totals.join(ent, "feature")
        .join(best, "feature")
        .select(
            "feature",
            F.col("_b.label").alias("predicted"),
            "entropy",
            "size",
        )
        .orderBy(F.asc("entropy"), F.desc("size"), F.asc("feature"))
    )
    return out.limit(top_k) if top_k else out
