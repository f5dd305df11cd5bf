"""Highlighting — Solr's highlighter (`hl=true&hl.fl=...`; the
DefaultSolrHighlighter / UnifiedHighlighter behavior every reference
handler's results page renders through): per matching doc, the best
fixed-width token window around the query terms, with matched tokens
wrapped in pre/post tags.

Deterministic snippet rule (simplified but fully specified, so an
independent SQL engine reproduces it byte-for-byte):
  1. tokens = whitespace-split of lower(text), empties dropped —
     these are the DISPLAY units the snippet reassembles from; a
     display token is a HIT iff any of its index-grammar subtokens
     (split on ``[^a-z0-9]+``, the analyzer chain the index was built
     with — text/lm._token_array) equals a query term, so
     punctuation-adjacent occurrences like ``dup.`` or ``(batch)``
     highlight exactly where the index matched them;
  2. the snippet window is the ``window`` consecutive tokens with the
     MOST query-term hits (occurrence count, not distinct terms);
     ties break to the EARLIEST window (Lucene's highlighter also
     prefers leading fragments at equal score);
  3. matched tokens wrap in ``pre``/``post``; the snippet is the
     window joined with single spaces.

Everything is pyspark.sql.functions array expressions — zero UDFs,
zero shuffles, zero driver crossings: highlight is a projection, so
at 10^12 docs it runs where highlighting belongs — over the k-row
RESULT PAGE (Solr highlights the page it returns, never the match
set). `highlight_snippets` composes with any surface that yields
(doc_id, text): the flat corpus, or `fetch_docs` docstore pages on
the packed path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _snippet_cols(
    text: Column, terms: list[str], window: int, pre: str, post: str
) -> tuple[Column, Column, Column]:
    """(snippet, window_hits, total_hits) expressions for one text
    column — shared by every highlight surface."""
    terms_arr = F.array(*[F.lit(t) for t in terms])

    def _is_hit(x: Column) -> Column:
        # index-grammar subtokens of the display token — a hit iff any
        # subtoken is a query term ("dup." / "(batch)" must highlight)
        return F.arrays_overlap(
            F.filter(F.split(x, r"[^a-z0-9]+"), lambda s: s != ""), terms_arr
        )

    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    hits = F.transform(toks, lambda x: F.when(_is_hit(x), 1).otherwise(0))
    n = F.size(toks)
    w = F.least(F.lit(int(window)), n)
    # window scores by direct slice-sum: O(n * window) comparisons,
    # all inside one codegen'd projection (window is a small constant;
    # a prefix-sum fold saves nothing at these sizes and costs an
    # intermediate array per row)
    starts = F.sequence(F.lit(1), n - w + F.lit(1))
    scores = F.transform(
        starts,
        lambda i: F.aggregate(
            F.slice(hits, i, w), F.lit(0), lambda a, x: a + x
        ),
    )
    best = F.array_position(scores, F.array_max(scores))  # earliest max
    wrapped = F.transform(
        F.slice(toks, best.cast("int"), w),
        lambda x: F.when(
            _is_hit(x), F.concat(F.lit(pre), x, F.lit(post))
        ).otherwise(x),
    )
    snippet = F.array_join(wrapped, " ")
    window_hits = F.array_max(scores)
    total_hits = F.aggregate(hits, F.lit(0), lambda a, x: a + x)
    return snippet, window_hits, total_hits


def highlight_snippets(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    window: int = 8,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """(doc_id, snippet, hits) for every input doc containing at least
    one query term — ``hits`` is the snippet window's occurrence
    count. Docs with no hits are dropped (Solr omits them from the
    highlighting section)."""
    snippet, window_hits, total_hits = _snippet_cols(
        F.col(text_col), [t.lower() for t in terms], window, pre, post
    )
    return (
        docs.select(
            "doc_id",
            snippet.alias("snippet"),
            window_hits.cast("long").alias("hits"),
            total_hits.alias("_total"),
        )
        .filter(F.col("_total") > 0)
        .drop("_total")
    )
