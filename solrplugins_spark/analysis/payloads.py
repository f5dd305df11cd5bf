"""Payloads: per-token float weights and payload-aware scoring inputs.

Reference semantics:
- Index-time payloads attach a float to each token position; delimited
  as `term^weight` in query strings (PayloadQueryBoostTokenFilter
  .java:33-56) and `term|weight` in Solr delimited-payload fields.
- Scoring uses the AVERAGE payload at match positions
  (PayloadScoreQuery + AveragePayloadFunction, MLTQuery.java:60-67,
  includeSpanScore=false -> the payload average IS the term score).
- MeanPayloadTokenFilter.java:37-77 averages duplicate-term payloads
  and L2-normalizes the mean vector (see analysis.filters.mean_payload).

Engine shape: a payload corpus tokenizes to (term, weight) pairs; the
payload index is flat postings (doc_id, term, tf, dl, payload) where
``payload`` = mean weight across the doc's positions of that term.
The scorer multiplies it in when Similarity.use_payload is set.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex

_TOKEN = re.compile(r"[^a-z0-9^.|]+")


def parse_payload_tokens(text: str, delim: str = "^") -> list[tuple[str, float]]:
    """`term^w` tokens -> (term, weight); missing weight -> 1.0."""
    out = []
    for raw in _TOKEN.split((text or "").lower()):
        if not raw:
            continue
        if delim in raw:
            term, _, w = raw.partition(delim)
            try:
                weight = float(w)
            except ValueError:
                term, weight = raw, 1.0
        else:
            term, weight = raw, 1.0
        if term:
            out.append((term, weight))
    return out


def counted_terms_with_payload(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "^",
) -> DataFrame:
    """(doc_id, term, tf, dl, payload) — tf + mean positional payload
    per (doc, term), one Arrow pass (same shape as counted_terms)."""

    def batches(it):
        for pdf in it:
            rows_doc, rows_term, rows_w = [], [], []
            for d, s in zip(pdf[doc_col], pdf[text_col]):
                for t, w in parse_payload_tokens(s, delim):
                    rows_doc.append(d)
                    rows_term.append(t)
                    rows_w.append(w)
            if not rows_doc:
                continue
            out = pd.DataFrame({"doc_id": rows_doc, "term": rows_term, "w": rows_w})
            g = (
                out.groupby(["doc_id", "term"], sort=False)
                .agg(tf=("w", "size"), payload=("w", "mean"))
                .reset_index()
            )
            g["dl"] = g.groupby("doc_id", sort=False)["tf"].transform("sum")
            yield g[["doc_id", "term", "tf", "dl", "payload"]]

    return docs.select(F.col(doc_col).alias(doc_col), text_col).mapInPandas(
        batches, schema="doc_id long, term string, tf long, dl long, payload double"
    )


def build_payload_index(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text", delim: str = "^"
) -> InvertedIndex:
    """InvertedIndex whose postings carry a mean-payload column."""
    postings = counted_terms_with_payload(docs, doc_col, text_col, delim).persist()
    terms = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    doclen = postings.select("doc_id", "dl").dropDuplicates(["doc_id"])
    n_docs = docs.count()
    total = postings.agg(F.sum("tf")).collect()[0][0] or 0
    return InvertedIndex(
        postings=postings,
        terms=terms,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=float(total) / n_docs if n_docs else 0.0,
        docs=docs,
    )
