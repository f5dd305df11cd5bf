"""Function-query tests vs hand-computed pandas oracle
(TermIntersectsValueSource 4 normalizations, binarytermexists,
fieldlen variants, fieldval, termoverlap)."""

import numpy as np
import pandas as pd
import pytest

from solrplugins_spark.analysis.tokenizer import tokenize_pandas
from solrplugins_spark.functions import (
    binary_term_exists,
    field_len,
    field_val,
    term_freq,
    term_intersect,
    term_overlap,
)
from solrplugins_spark.index.builder import forward_index


@pytest.fixture(scope="module")
def fwd(tiny_corpus):
    return forward_index(tiny_corpus).persist()


@pytest.fixture(scope="module")
def doc_terms(tiny_corpus_pd):
    toks = tokenize_pandas(tiny_corpus_pd["text"])
    return {
        d: list(t)
        for d, t in zip(tiny_corpus_pd["doc_id"], toks)
        if len(t) > 0
    }


PARAMS = ["w0000", "w0003", "zephyrblade", "notaword"]


def test_term_freq_and_binary(fwd, doc_terms):
    got = fwd.select(
        "doc_id",
        term_freq("w0000").alias("tf"),
        binary_term_exists("w0000").alias("b"),
    ).toPandas().set_index("doc_id")
    for d, toks in doc_terms.items():
        want = toks.count("w0000")
        assert got.loc[d, "tf"] == want
        assert got.loc[d, "b"] == min(1, want)


def test_field_len(fwd, doc_terms):
    got = fwd.select(
        "doc_id",
        field_len().alias("u"),
        field_len(unique=False).alias("t"),
    ).toPandas().set_index("doc_id")
    for d, toks in doc_terms.items():
        assert got.loc[d, "u"] == len(set(toks))
        assert got.loc[d, "t"] == len(toks)


def test_field_val(fwd, doc_terms):
    got = fwd.select("doc_id", field_val().alias("v")).toPandas().set_index("doc_id")
    for d, toks in list(doc_terms.items())[:50]:
        assert got.loc[d, "v"] == "||".join(sorted(set(toks)))


@pytest.mark.parametrize("sim", ["jaccard", "doc", "param", "dice"])
def test_term_intersect(fwd, doc_terms, sim):
    got = fwd.select(
        "doc_id", term_intersect(PARAMS, sim).alias("s")
    ).toPandas().set_index("doc_id")
    pset = set(PARAMS)
    for d, toks in list(doc_terms.items())[:80]:
        ds = set(toks)
        inter = len(ds & pset)
        if sim == "jaccard":
            want = inter / len(ds | pset)
        elif sim == "doc":
            want = inter / len(ds)
        elif sim == "param":
            want = inter / len(pset)
        else:
            want = 2 * inter / (len(ds) + len(pset))
        assert abs(got.loc[d, "s"] - want) < 1e-9, (d, sim)


@pytest.mark.parametrize("use_dl", [False, True])
def test_term_overlap(fwd, doc_terms, use_dl):
    got = fwd.select(
        "doc_id", term_overlap(PARAMS, use_doc_length=use_dl).alias("s")
    ).toPandas().set_index("doc_id")
    pset = set(PARAMS)
    for d, toks in list(doc_terms.items())[:80]:
        ds = set(toks)
        num = len(ds & pset)
        denom = len(ds) if use_dl else len(pset)
        assert abs(got.loc[d, "s"] - num / denom) < 1e-9
