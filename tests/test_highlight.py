"""Highlighting (Solr hl=true): best fixed-width token window with
matched tokens wrapped — occurrence-count scoring, earliest-window
tie-break, pure JVM array expressions. Golden examples, a brute-force
recompute over the corpus, and the serving composition (docstore
result page -> highlight) must all agree."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.index.segments import build_segments, fetch_docs, wand_search
from solrplugins_spark.query.highlight import highlight_snippets


def test_golden_window_selection(spark):
    """Second window has 2 hits vs 1 — must win; wrapping exact."""
    docs = spark.createDataFrame(
        [(0, "x dup x x x x y y dup batch y y")], "doc_id long, text string"
    )
    got = highlight_snippets(docs, ["dup", "batch"], window=4).collect()[0]
    # windows of 4: [dup batch y y] at pos 8 has 2 hits, earliest 2-hit
    # window starts at 'y y dup batch' (pos 6): hits(y,y,dup,batch)=2,
    # earlier window pos 5 'y y y dup'? tokens: x dup x x x x y y dup batch y y
    # first 2-hit window is 'dup batch' together: starts where both in span
    assert got["hits"] == 2
    assert "<em>dup</em>" in got["snippet"] and "<em>batch</em>" in got["snippet"]
    toks = got["snippet"].split(" ")
    assert len(toks) == 4


def test_golden_earliest_tie(spark):
    """Two windows with equal hits -> earliest wins."""
    docs = spark.createDataFrame(
        [(0, "dup a b c d e f g dup")], "doc_id long, text string"
    )
    got = highlight_snippets(docs, ["dup"], window=3).collect()[0]
    assert got["snippet"] == "<em>dup</em> a b"
    assert got["hits"] == 1


def test_short_text_window_clamps(spark):
    docs = spark.createDataFrame([(0, "dup x")], "doc_id long, text string")
    got = highlight_snippets(docs, ["dup"], window=8).collect()[0]
    assert got["snippet"] == "<em>dup</em> x"


def test_no_hit_and_empty_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "dup")], "doc_id long, text string"
    )
    got = highlight_snippets(docs, ["dup"], window=4).toPandas()
    assert list(got["doc_id"]) == [2]


def _brute(pdf, terms, window):
    out = []
    for _, r in pdf.iterrows():
        toks = [t for t in str(r["text"]).lower().split() if t]
        hits = [1 if t in terms else 0 for t in toks]
        if sum(hits) == 0 or not toks:
            continue
        w = min(window, len(toks))
        scores = [sum(hits[i:i + w]) for i in range(len(toks) - w + 1)]
        best = scores.index(max(scores))
        frag = [
            f"<em>{t}</em>" if t in terms else t for t in toks[best:best + w]
        ]
        out.append((r["doc_id"], " ".join(frag), max(scores)))
    return pd.DataFrame(out, columns=["doc_id", "snippet", "hits"])


def test_corpus_brute_force(tiny_corpus, tiny_corpus_pd, tiny_index):
    terms = [
        r["term"]
        for r in tiny_index.terms.orderBy(F.desc("df"), F.asc("term")).limit(2).collect()
    ]
    got = (
        highlight_snippets(tiny_corpus, terms, window=5)
        .orderBy("doc_id")
        .toPandas()
    )
    want = _brute(tiny_corpus_pd, set(terms), 5).sort_values("doc_id").reset_index(drop=True)
    got["hits"] = got["hits"].astype(int)
    want["hits"] = want["hits"].astype(int)
    pd.testing.assert_frame_equal(got, want)


def test_result_page_highlight_via_docstore(spark, tiny_index, tmp_path):
    """The at-scale serving shape: top-k -> docstore point read ->
    highlight the page. Snippets equal the flat-corpus ones."""
    seg = build_segments(
        tiny_index, str(tmp_path / "hl"), seg_size=128, groups=2,
        store_cols=["text"],
    )
    terms = [("w0000", 1.0), ("w0001", 1.0)]
    page = wand_search(spark, seg, terms, k=5).collect()
    ids = [int(r["doc_id"]) for r in page]
    stored = fetch_docs(spark, seg, ids)
    got = (
        highlight_snippets(stored, ["w0000", "w0001"], window=6)
        .orderBy("doc_id")
        .toPandas()
    )
    flat = (
        highlight_snippets(
            tiny_index.docs.filter(F.col("doc_id").isin(ids)),
            ["w0000", "w0001"], window=6,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, flat)


def test_plan_is_single_projection(tiny_corpus):
    """Zero exchanges, zero UDFs: highlight must stay a projection."""
    plan = highlight_snippets(tiny_corpus, ["dup"], window=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_punctuation_adjacent_terms_highlight(spark):
    """The index grammar splits on [^a-z0-9]+ (text/lm._token_array),
    so 'dup.' and '(batch),' ARE index hits for dup/batch — the
    snippet must highlight them, not silently miss the very tokens
    that produced the match."""
    docs = spark.createDataFrame(
        [(0, "see dup. and (batch), here"), (1, "duplicate is not a hit")],
        "doc_id long, text string",
    )
    got = highlight_snippets(docs, ["dup", "batch"], window=5).toPandas()
    # doc 1: 'duplicate' must NOT match (subtoken is 'duplicate')
    assert list(got["doc_id"]) == [0]
    snip = got.iloc[0]["snippet"]
    assert "<em>dup.</em>" in snip
    assert "<em>(batch),</em>" in snip
    assert int(got.iloc[0]["hits"]) == 2
