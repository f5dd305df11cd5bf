"""Weighted synonym expansion (QueryBoostingQParser semantics):
multi-word surfaces, payload skip rules, boosted execution."""

import pandas as pd
import pytest

from solrplugins_spark import oracle
from solrplugins_spark.query.boosting import (
    boosted_synonym_search,
    expand_terms,
    load_synonyms,
)
from solrplugins_spark.query.scorer import BM25


SYN = load_synonyms([
    ("java developer", "jdev", 0.8),
    ("java", "jvm", 0.5),
    ("sql", "database", 0.0),        # payload 0 -> skipped
    ("sql", "rdbms", 1e-8),          # scientific notation -> skipped
    ("Ruby", "rails", 2.0),
])


def test_multiword_longest_match_wins():
    got = expand_terms("java developer here", SYN)
    d = dict(got)
    assert d["jdev"] == 0.8          # two-word surface matched
    assert "jvm" not in d            # single-word 'java' NOT matched inside
    assert d["java"] == 1.0 and d["developer"] == 1.0 and d["here"] == 1.0


def test_single_word_expansion_and_skips():
    got = dict(expand_terms("java and sql", SYN))
    assert got["jvm"] == 0.5
    assert "database" not in got     # weight 0 skipped
    assert "rdbms" not in got        # 1e-8 renders as scientific -> skipped
    assert got["sql"] == 1.0


def test_case_insensitive_surface():
    got = dict(expand_terms("RUBY", SYN))
    assert got["rails"] == 2.0


def test_boosted_execution_matches_manual_bag(tiny_index, tiny_corpus_pd):
    syn = load_synonyms([("w0001", "zephyrblade", 3.0)])
    got = boosted_synonym_search(tiny_index, "w0001 w0002", syn, k=10).toPandas()
    oi = oracle.build_oracle_index(tiny_corpus_pd)
    want = oracle.topk(
        oracle.score_query(
            oi, [("w0001", 1.0), ("w0002", 1.0), ("zephyrblade", 3.0)], BM25
        ),
        10,
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
