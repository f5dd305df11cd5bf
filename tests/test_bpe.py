"""BPE tokenizer training (text/bpe.py) vs a pure-python reference
implementation of Sennrich et al. 2016 — pair statistics, the merge
table, and the encoder must all agree exactly, including the
deterministic (cnt desc, l asc, r asc) tie-break."""

import pandas as pd
import pytest

from solrplugins_spark.analysis.tokenizer import tokenize_pandas
from solrplugins_spark.text.bpe import (
    apply_bpe,
    bpe_pair_counts,
    train_bpe,
    word_counts,
)


@pytest.fixture(scope="module")
def bpe_docs_pd():
    rows = [
        (0, "the lower the newer the wider"),
        (1, "lowest newest widest, lowest!"),
        (2, "new low wide new low"),
        (3, "lower and lower and newest"),
        (4, "a ab abc abcd"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def bpe_docs(spark, bpe_docs_pd):
    return spark.createDataFrame(bpe_docs_pd).persist()


def _word_freqs(pdf):
    freqs: dict[str, int] = {}
    for text in pdf["text"]:
        for w in tokenize_pandas(pd.Series([text]))[0]:
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_pair_counts(seqs, freqs):
    counts: dict[tuple[str, str], int] = {}
    for w, f in freqs.items():
        s = seqs[w]
        for a, b in zip(s, s[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def _ref_merge(s, l, r):
    res, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
            res.append(l + r)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def ref_train(freqs, n_merges):
    seqs = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(seqs, freqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seqs = {w: _ref_merge(s, *best) for w, s in seqs.items()}
    return merges, seqs


def test_word_counts_matches_brute(bpe_docs, bpe_docs_pd):
    got = {
        r["word"]: r["cnt"] for r in word_counts(bpe_docs).collect()
    }
    assert got == _word_freqs(bpe_docs_pd)


def test_pair_counts_match_reference(bpe_docs, bpe_docs_pd):
    freqs = _word_freqs(bpe_docs_pd)
    seqs = {w: list(w) for w in freqs}
    ref = _ref_pair_counts(seqs, freqs)
    want = sorted(
        ((c, l, r) for (l, r), c in ref.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    got = [
        (r["cnt"], r["l"], r["r"])
        for r in bpe_pair_counts(bpe_docs, limit=10).collect()
    ]
    assert got == want


def test_train_bpe_matches_reference(bpe_docs, bpe_docs_pd):
    freqs = _word_freqs(bpe_docs_pd)
    want, _ = ref_train(freqs, 8)
    got = train_bpe(bpe_docs, 8, checkpoint_every=3)
    assert got == want


def test_apply_bpe_encodes_like_reference(bpe_docs, bpe_docs_pd):
    freqs = _word_freqs(bpe_docs_pd)
    merges, seqs = ref_train(freqs, 8)
    out = apply_bpe(bpe_docs, merges).toPandas().sort_values("doc_id")
    for _, row in out.iterrows():
        toks = list(
            tokenize_pandas(pd.Series([row["text"]]))[0]
        )
        want = [sym for w in toks for sym in seqs[w]]
        assert list(row["bpe_tokens"]) == want
        # lossless: symbols concatenate back to the original words
        assert "".join(row["bpe_tokens"]) == "".join(toks)


def test_train_bpe_exhausts_gracefully(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["ab ab"]})
    )
    # only one mergeable pair exists; extra rounds must stop, not loop
    merges = train_bpe(docs, 5)
    assert merges[0] == ("a", "b")
    assert len(merges) == 1


def test_batched_train_identical_with_overlapping_pairs(spark):
    """r07 batched trainer: the merge table must be bit-identical to
    the sequential reference on a corpus engineered so top candidate
    pairs SHARE symbols and merges breed competitive new pairs (the
    cases where naive top-m batching diverges), while the round count
    drops below one-job-per-merge on a batchable corpus."""
    rows = [
        (0, "aaab aab abab baba abba"),
        (1, "cdcd cdc dcd ccdd ddcc"),
        (2, "efg efg efgh ghef fgef"),
        (3, "xxyy xyxy yxyx xy yx"),
        (4, "the them theme therm thermal"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    freqs = _word_freqs(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for n in (1, 3, 7, 12, 20):
        want, _ = ref_train(freqs, n)
        got = train_bpe(docs, n, checkpoint_every=3)
        assert got == want, f"n_merges={n}"


def test_batched_train_uses_fewer_rounds(spark):
    """Disjoint-alphabet corpus: every top pair is symbol-disjoint, so
    one round must accept several merges (the 32k-sequential-jobs
    scale fix VERDICT r06 demanded)."""
    rows = [(i, w * 30) for i, w in enumerate(["ab ", "cd ", "ef ", "gh ", "ij "])]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    freqs = _word_freqs(pd.DataFrame(rows, columns=["doc_id", "text"]))
    stats: dict = {}
    got = train_bpe(docs, 5, stats=stats)
    want, _ = ref_train(freqs, 5)
    assert got == want
    assert stats["rounds"] < 5, stats
