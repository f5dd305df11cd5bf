"""Joint counts / probability model / naive bayes / stumps vs
hand-computed oracles (alpha=0.01 smoothing per
JointProbabilityModel.java:22)."""

import math

import pandas as pd
import pytest

from solrplugins_spark.analytics.jointcounts import (
    build_joint_probability_model,
    joint_counts,
    pivot_counts,
)
from solrplugins_spark.analytics.naivebayes import (
    naive_bayes_classify,
    naive_bayes_model,
)
from solrplugins_spark.analytics.stumps import extract_features, learn_stumps
from solrplugins_spark.index.builder import build_index


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (0, "spark sql fast", "tech", "en"),
        (1, "spark join slow", "tech", "en"),
        (2, "ruby rails", "web", "en"),
        (3, "ruby gems fast", "web", "fr"),
        (4, "spark sql window", "tech", "fr"),
        (5, "rails deploy", "web", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, cat string, lang string")


def test_joint_counts(labeled):
    got = joint_counts(labeled, "cat", "lang").toPandas().sort_values(["a", "b"])
    want = {("tech", "en"): 2, ("tech", "fr"): 1, ("web", "en"): 2, ("web", "fr"): 1}
    assert dict(zip(zip(got["a"], got["b"]), got["cnt"])) == want


def test_joint_counts_mincount_and_filter(labeled, spark):
    got = joint_counts(labeled, "cat", "lang", min_count=2).toPandas()
    assert set(got["cnt"]) == {2}
    filt = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got2 = joint_counts(labeled, "cat", "lang", filter_docs=filt).toPandas()
    assert dict(zip(zip(got2["a"], got2["b"]), got2["cnt"])) == {
        ("tech", "en"): 2, ("web", "en"): 1
    }


def test_pivot_counts_rollup(labeled):
    got = pivot_counts(labeled, ["cat", "lang"]).toPandas()
    total = got[got["depth"] == 0]
    assert list(total["cnt"]) == [6]
    level1 = got[got["depth"] == 1].set_index("cat")["cnt"]
    assert level1["tech"] == 3 and level1["web"] == 3


def test_joint_probability_model(labeled):
    m = build_joint_probability_model(labeled, "cat", "lang", alpha=0.01)
    # priors: 4 observed entries (tech 3, web 3, en 4, fr 2), each +0.01
    total_p = (3 + 0.01) + (3 + 0.01) + (4 + 0.01) + (2 + 0.01)
    assert abs(m.prior("cat", "tech") - (3.01 / total_p)) < 1e-9
    # unobserved value -> alpha / total
    assert abs(m.prior("cat", "nope") - (0.01 / total_p)) < 1e-9
    total_j = (2.01 + 1.01 + 2.01 + 1.01)
    assert abs(m.joint("cat", "tech", "lang", "en") - 2.01 / total_j) < 1e-9
    # symmetric key
    assert m.joint("lang", "en", "cat", "tech") == m.joint("cat", "tech", "lang", "en")
    # conditional p(tech|en) = p(tech^en)/p(en)
    want = (2.01 / total_j) / (4.01 / total_p)
    assert abs(m.conditional("cat", "tech", "lang", "en") - want) < 1e-9
    # unobserved condition -> 0, never 1
    assert m.conditional("cat", "tech", "lang", "de") == 0.0


def test_naive_bayes(labeled):
    priors, conds = naive_bayes_model(labeled, "cat")
    got = naive_bayes_classify(
        labeled.select("doc_id", "text"), priors, conds, top_n=2
    ).toPandas()
    top1 = got[got["rank"] == 1].set_index("doc_id")["cls"]
    assert top1[0] == "tech" and top1[1] == "tech" and top1[4] == "tech"
    assert top1[2] == "web" and top1[5] == "web"
    # hand-check doc 2 ("ruby rails") score for class web:
    pr = priors.toPandas().set_index("cls")
    cd = conds.toPandas().set_index(["term", "cls"])
    a = 0.01
    want = math.log(pr.loc["web", "prior_p"])
    for t in ["ruby", "rails"]:
        want += math.log(1.0 * cd.loc[(t, "web"), "cond_p"])
    g = got[(got["doc_id"] == 2) & (got["cls"] == "web")]["score"].iloc[0]
    assert abs(g - want) < 1e-9


def test_stumps(labeled, spark):
    idx = build_index(labeled)
    feats = extract_features(labeled, idx.terms, min_df=1)
    labels = labeled.select("doc_id", labeled["cat"].alias("label"))
    got = learn_stumps(feats, labels).toPandas()
    by_feat = got.set_index("feature")
    # 'spark' appears only in tech docs -> entropy 0, size 3, predicts tech
    assert by_feat.loc["spark", "entropy"] == 0.0
    assert by_feat.loc["spark", "predicted"] == "tech"
    assert by_feat.loc["spark", "size"] == 3
    # 'fast' appears in one tech + one web doc -> entropy ln2
    assert abs(by_feat.loc["fast", "entropy"] - math.log(2)) < 1e-9
    # ranking: zero-entropy features first, bigger partitions first
    assert got.iloc[0]["entropy"] == 0.0
    first_zero = got[got["entropy"] == 0.0]
    assert first_zero.iloc[0]["size"] >= first_zero.iloc[-1]["size"]
