from .jointcounts import joint_counts, pivot_counts, JointProbabilityModel
from .naivebayes import naive_bayes_model, naive_bayes_classify
from .stumps import entropy_expr, learn_stumps, extract_features

__all__ = [
    "joint_counts",
    "pivot_counts",
    "JointProbabilityModel",
    "naive_bayes_model",
    "naive_bayes_classify",
    "entropy_expr",
    "learn_stumps",
    "extract_features",
]
