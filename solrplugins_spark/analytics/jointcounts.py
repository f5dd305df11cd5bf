"""Joint (pivot) counts and the smoothed joint-probability model.

Reference:
- JointCounts.java:54-118 — recursive field_A x field_B pivot counts,
  pruned by mincount per level, over an optional filter DocSet.
- JointProbabilityModel.java — priors and joints with add-alpha
  smoothing (alpha default 0.01, :22); totals are sums of the SMOOTHED
  observed counts (:67-77); joint keys are symmetric (:84-95);
  conditional p(a|b) = joint/prior_b, with unobserved b mapping to 0
  (:113-121 — "don't return p == 1 for unobserved values").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def joint_counts(
    df: DataFrame,
    field_a: str,
    field_b: str,
    min_count: int = 1,
    filter_docs: DataFrame | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """(a, b, cnt) co-occurrence counts, mincount-pruned
    (JointCounts.doPivots). One hash-agg shuffle; the optional DocSet
    filter is a left-semi join placed before the agg so pruning happens
    map-side."""
    if filter_docs is not None:
        df = df.join(filter_docs.select(key_col), key_col, "left_semi")
    return (
        df.groupBy(F.col(field_a).alias("a"), F.col(field_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def pivot_counts(
    df: DataFrame,
    fields: list[str],
    min_count: int = 1,
    filter_docs: DataFrame | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """n-level pivot: counts at every prefix depth of ``fields`` in one
    pass via ROLLUP (the idiomatic upgrade of the recursive Java
    pivots, SURVEY.md §2.4). Output: one row per grouping-set cell with
    null for unused levels, plus ``depth``."""
    if filter_docs is not None:
        df = df.join(filter_docs.select(key_col), key_col, "left_semi")
    rolled = (
        df.rollup(*fields)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    depth = sum([F.when(F.col(f).isNotNull(), 1).otherwise(0) for f in fields])
    return rolled.withColumn("depth", depth)


class JointProbabilityModel:
    """Driver-side smoothed probability model built from count frames.

    Mirrors JointProbabilityModel.java: broadcast-sized (class/facet
    vocabularies), built once per model refresh from two aggregations.
    """

    # hard cap on driver-side model rows: the reference's model is an
    # in-memory NamedList sized by facet vocabularies; an unpruned
    # high-cardinality pivot would OOM the driver silently. 5M rows
    # (~hundreds of MB as dict entries) is far above any real facet
    # vocabulary — hitting it means the pivot fields are wrong (ids,
    # free text) or min_count pruning is off.
    MAX_MODEL_ROWS = 5_000_000

    def __init__(
        self,
        priors_df: DataFrame,  # (field, value, cnt)
        joints_df: DataFrame,  # (field_a, a, field_b, b, cnt)
        alpha: float = 0.01,
    ):
        self.alpha = float(alpha)

        def bounded_collect(name: str, frame: DataFrame) -> list:
            # ONE bounded collect serves both the cap check and the
            # model build (limit caps the driver transfer; a separate
            # guard count would re-execute the aggregation)
            rows = frame.limit(self.MAX_MODEL_ROWS + 1).collect()
            if len(rows) > self.MAX_MODEL_ROWS:
                raise ValueError(
                    f"JointProbabilityModel: {name} frame exceeds "
                    f"{self.MAX_MODEL_ROWS} rows — the model is a "
                    "driver-side dict sized by facet vocabularies. Pivot "
                    "on low-cardinality fields or raise min_count "
                    "pruning; do not collect id-like columns."
                )
            return rows

        self.priors: dict[tuple[str, str], float] = {}
        for r in bounded_collect("priors", priors_df):
            self.priors[(r["field"], str(r["value"]))] = r["cnt"] + self.alpha
        self.joints: dict[tuple[str, str, str, str], float] = {}
        for r in bounded_collect("joints", joints_df):
            k = self._key(r["field_a"], str(r["a"]), r["field_b"], str(r["b"]))
            self.joints[k] = r["cnt"] + self.alpha
        self.total_priors = sum(self.priors.values())
        self.total_joints = sum(self.joints.values())

    @staticmethod
    def _key(fa: str, a: str, fb: str, b: str):
        ka, kb = (fa, a), (fb, b)
        return (ka, kb) if ka <= kb else (kb, ka)

    def prior(self, field: str, value: str) -> float:
        c = self.priors.get((field, value), self.alpha)
        return c / self.total_priors if self.total_priors else 0.0

    def joint(self, fa: str, a: str, fb: str, b: str) -> float:
        c = self.joints.get(self._key(fa, a, fb, b), self.alpha)
        return c / self.total_joints if self.total_joints else 0.0

    def conditional(self, fa: str, a: str, fb: str, b: str) -> float:
        """p(a|b) = p(a^b)/p(b); unobserved b -> 0 (not 1)."""
        c = self.priors.get((fb, b))
        if c is None:  # prior == smoothValue -> unobserved
            return 0.0
        return self.joint(fa, a, fb, b) / (c / self.total_priors)


def build_joint_probability_model(
    df: DataFrame, field_a: str, field_b: str, alpha: float = 0.01, min_count: int = 1
) -> JointProbabilityModel:
    """Two aggregations -> model (JointProbabilityComponent pipeline)."""
    priors = (
        df.select(F.lit(field_a).alias("field"), F.col(field_a).alias("value"))
        .unionByName(
            df.select(F.lit(field_b).alias("field"), F.col(field_b).alias("value"))
        )
        .groupBy("field", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    joints = (
        joint_counts(df, field_a, field_b, min_count)
        .select(
            F.lit(field_a).alias("field_a"),
            F.col("a"),
            F.lit(field_b).alias("field_b"),
            F.col("b"),
            F.col("cnt"),
        )
    )
    return JointProbabilityModel(priors, joints, alpha)
