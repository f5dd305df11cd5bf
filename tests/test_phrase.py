"""Positional-index phrase queries vs a pandas adjacency oracle, and
equivalence between the positional and containment-fallback paths."""

import pandas as pd
import pytest

from solrplugins_spark.analysis.tokenizer import tokenize_pandas
from solrplugins_spark.index.builder import build_index
from solrplugins_spark.query.compiler import execute_query, phrase_match_docs


@pytest.fixture(scope="module")
def pos_corpus_pd():
    rows = [
        (0, "java developer wanted for java team"),
        (1, "developer java is reversed here"),
        (2, "senior java developer and java developer lead"),
        (3, "java then stuff then developer apart"),
        (4, "JAVA Developer! with punctuation"),
        (5, "nothing relevant"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def pos_index(spark, pos_corpus_pd):
    return build_index(spark.createDataFrame(pos_corpus_pd), positions=True).persist()


@pytest.fixture(scope="module")
def fallback_index(spark, pos_corpus_pd):
    return build_index(spark.createDataFrame(pos_corpus_pd), positions=False).persist()


def oracle_phrase_docs(pdf, phrase):
    want = []
    ptoks = phrase.split()
    for d, text in zip(pdf["doc_id"], pdf["text"]):
        toks = list(tokenize_pandas(pd.Series([text]))[0])
        if any(toks[i : i + len(ptoks)] == ptoks for i in range(len(toks))):
            want.append(d)
    return sorted(want)


@pytest.mark.parametrize(
    "phrase", ["java developer", "developer java", "java developer lead",
               "java team", "nosuch phrase"]
)
def test_phrase_positions_vs_oracle(pos_index, pos_corpus_pd, phrase):
    got = sorted(
        r["doc_id"]
        for r in phrase_match_docs(pos_index, phrase.split()).collect()
    )
    assert got == oracle_phrase_docs(pos_corpus_pd, phrase)


@pytest.mark.parametrize("q", ['"java developer"', '"java developer" or nothing'])
def test_phrase_paths_agree(pos_index, fallback_index, q):
    a = execute_query(pos_index, q, k=10).toPandas()
    b = execute_query(fallback_index, q, k=10).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_phrase_positions_content(pos_index):
    row = (
        pos_index.postings.filter("doc_id = 2 and term = 'java'")
        .select("positions")
        .first()
    )
    assert list(row["positions"]) == [1, 4]
