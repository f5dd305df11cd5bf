"""Token-filter stage unit tests (reference tokenfilters/*.java) and
file-dictionary loading."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.analysis.filters import (
    concatenate_tokens,
    constant_token_filter,
    mean_payload,
    payload_boost_tokens,
)
from solrplugins_spark.suggest import file_dictionary


def test_constant_token_filter(spark):
    df = spark.createDataFrame([(0, ["a", "b", "c"])], "id long, toks array<string>")
    got = df.select(constant_token_filter(F.col("toks"), "X").alias("t")).first()["t"]
    assert list(got) == ["X", "X", "X"]


def test_concatenate_tokens_cross_product():
    # ConcatenateTokenFilter.makePhrases: synonym stacks per position
    stacks = [["big", "large"], ["data"], ["set", "sets"]]
    got = concatenate_tokens(stacks)
    assert got == ["big data set", "big data sets", "large data set", "large data sets"]
    assert concatenate_tokens([]) == []
    assert concatenate_tokens([["solo"]]) == ["solo"]


def test_payload_boost_tokens_skip_rules():
    # `term` -> `term^payload`, skipping 0 and scientific-notation
    terms = pd.Series(["java", "sql", "ruby", "go"])
    weights = pd.Series([2.5, 0.0, 1e-9, None])
    got = list(payload_boost_tokens(terms, weights))
    assert got == ["java^2.5", "sql", "ruby", "go"]


def test_mean_payload_l2_normalizes():
    # MeanPayloadTokenFilter: mean duplicate payloads then L2 norm
    terms = pd.Series(["a", "b", "a"])
    weights = pd.Series([3.0, 4.0, 1.0])
    got = mean_payload(terms, weights)
    # means: a=2.0, b=4.0 -> norm sqrt(4+16)=sqrt(20)
    norm = np.sqrt(20.0)
    assert list(got["term"]) == ["a", "b"]  # first-seen order
    np.testing.assert_allclose(got["weight"], [2.0 / norm, 4.0 / norm])
    # vector has unit length
    np.testing.assert_allclose((got["weight"] ** 2).sum(), 1.0)


def test_file_dictionary(spark, tmp_path):
    p1 = tmp_path / "d1.txt"
    p1.write_text("hadoop\t10\nApache Hadoop\t40\n")
    p2 = tmp_path / "d2.txt"
    p2.write_text("python\t7\nnofreqline\n")
    got = (
        file_dictionary(spark, [str(p1), str(p2)])
        .orderBy("phrase")
        .toPandas()
    )
    d = dict(zip(got["phrase"], got["freq"]))
    assert d == {"Apache Hadoop": 40, "hadoop": 10, "python": 7, "nofreqline": 1}
