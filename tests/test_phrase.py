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


# ---- sloppy phrases (`"a b"~n`, ordered SpanNearQuery) ----------------

import itertools

import numpy as np

from solrplugins_spark.index.segments import (
    _sloppy_chain_docs,
    build_segments,
    wand_boolean_search,
    wand_phrase_search,
)
from solrplugins_spark.query.compiler import sloppy_phrase_match_docs
from solrplugins_spark.query.parser import parse_query


def oracle_slop_docs(pdf, phrase, slop):
    """Brute-force ordered span-near: any in-order position selection
    whose window holds at most `slop` extra positions."""
    ptoks = phrase.split()
    out = []
    for d, text in zip(pdf["doc_id"], pdf["text"]):
        toks = list(tokenize_pandas(pd.Series([text]))[0])
        pos = [[i for i, x in enumerate(toks) if x == t] for t in ptoks]
        if any(not p for p in pos):
            continue
        hit = any(
            all(c[i] < c[i + 1] for i in range(len(c) - 1))
            and c[-1] - c[0] - (len(c) - 1) <= slop
            for c in itertools.product(*pos)
        )
        if hit:
            out.append(d)
    return sorted(out)


def test_parser_slop_suffix():
    tree, errors = parse_query('"java developer"~2')
    assert not errors
    assert tree.slop == 2 and tree.child.value == "java developer"
    assert tree.evaluate() == '"java developer"~2'
    # no suffix -> exact phrase, unchanged golden behavior
    tree0, _ = parse_query('"java developer"')
    assert tree0.slop == 0 and tree0.evaluate() == '"java developer"'
    # a non-numeric ~token stays an ordinary sequence term (OR-fold)
    treex, _ = parse_query('"java developer" ~x')
    assert type(treex).__name__ == "Or"
    # suffix composes with boolean context
    treeb, _ = parse_query('"java developer"~1 and team')
    assert type(treeb).__name__ == "And" and treeb.left.slop == 1


@pytest.mark.parametrize(
    "phrase,slop",
    [
        ("java developer", 0),
        ("java developer", 1),
        ("java developer", 3),
        ("developer java", 0),
        ("developer java", 2),
        ("java team", 1),
        ("java developer lead", 0),
        ("java developer lead", 2),
        ("java stuff developer", 1),
        ("nosuch phrase", 4),
    ],
)
def test_sloppy_flat_vs_oracle(pos_index, pos_corpus_pd, phrase, slop):
    got = sorted(
        r["doc_id"]
        for r in sloppy_phrase_match_docs(
            pos_index, phrase.split(), slop
        ).collect()
    )
    assert got == oracle_slop_docs(pos_corpus_pd, phrase, slop)


def test_sloppy_slop0_equals_exact(pos_index, pos_corpus_pd):
    for phrase in ["java developer", "developer java", "java developer lead"]:
        exact = sorted(
            r["doc_id"]
            for r in phrase_match_docs(pos_index, phrase.split()).collect()
        )
        sloppy = sorted(
            r["doc_id"]
            for r in sloppy_phrase_match_docs(
                pos_index, phrase.split(), 0
            ).collect()
        )
        assert sloppy == exact


@pytest.fixture(scope="module")
def pos_segments(spark, pos_index, tmp_path_factory):
    out = tmp_path_factory.mktemp("phrase_slop") / "idx"
    return build_segments(pos_index, str(out), seg_size=2, groups=2)


@pytest.mark.parametrize("slop", [0, 1, 2, 4])
def test_sloppy_packed_matches_flat(spark, pos_index, pos_segments, slop):
    q = f'"java developer"~{slop}' if slop else '"java developer"'
    flat = execute_query(pos_index, q, k=10).toPandas()
    packed = wand_phrase_search(
        spark, pos_segments, ["java", "developer"], k=10, slop=slop
    ).toPandas()
    pd.testing.assert_frame_equal(flat, packed)
    # boolean-kernel Quote path (parse -> per-segment evaluate)
    kernel = wand_boolean_search(spark, pos_segments, q, k=10).toPandas()
    pd.testing.assert_frame_equal(flat, kernel)


def test_sloppy_packed_boolean_context(spark, pos_index, pos_segments):
    q = '"java developer"~2 and team'
    flat = execute_query(pos_index, q, k=10).toPandas()
    packed = wand_boolean_search(spark, pos_segments, q, k=10).toPandas()
    pd.testing.assert_frame_equal(flat, packed)


def test_sloppy_chain_matches_brute_random():
    """_sloppy_chain_docs vs itertools brute force on random position
    sets — the greedy-minimal extension must be exhaustive-equivalent."""
    rng = np.random.default_rng(7)
    for trial in range(200):
        n_terms = int(rng.integers(2, 5))
        n_docs = int(rng.integers(1, 5))
        slop = int(rng.integers(0, 4))
        slot_data = []
        per_doc_pos: list[list[list[int]]] = [[] for _ in range(n_docs)]
        used = [set() for _ in range(n_docs)]
        for _t in range(n_terms):
            docs, tfs, flat_pos = [], [], []
            term_pos_by_doc = []
            for d in range(n_docs):
                avail = [p for p in range(12) if p not in used[d]]
                k = int(rng.integers(0, 4))
                ps = sorted(rng.choice(avail, size=min(k, len(avail)),
                                       replace=False)) if k else []
                used[d].update(ps)
                term_pos_by_doc.append(list(ps))
                if ps:
                    docs.append(d)
                    tfs.append(len(ps))
                    flat_pos.extend(ps)
            slot_data.append(
                (
                    np.asarray(docs, np.int64),
                    np.asarray(tfs, np.int64),
                    np.asarray(flat_pos, np.int64),
                )
            )
            for d in range(n_docs):
                per_doc_pos[d].append(term_pos_by_doc[d])
        got = list(
            _sloppy_chain_docs(slot_data, 0, slop,
                               np.arange(n_docs, dtype=np.int64))
        )
        want = []
        for d in range(n_docs):
            pos = per_doc_pos[d]
            if any(not p for p in pos):
                continue
            hit = any(
                all(c[i] < c[i + 1] for i in range(len(c) - 1))
                and c[-1] - c[0] - (len(c) - 1) <= slop
                for c in itertools.product(*pos)
            )
            if hit:
                want.append(d)
        assert got == want, (trial, slot_data, slop)
