"""Brute-force pure-pandas scorer — the test oracle.

Recomputes tokenize -> tf/df/doclen -> BM25/classic scores over the
whole (small) corpus with no Spark involved, so engine results can be
asserted rank-identical (SURVEY.md §5.2). Regenerated in-test, never
stored stale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .analysis.tokenizer import tokenize_pandas
from .query.scorer import Similarity


@dataclass
class OracleIndex:
    postings: pd.DataFrame  # (term, doc_id, tf)
    terms: pd.DataFrame     # (term, df, cf)
    doclen: pd.DataFrame    # (doc_id, dl)
    n_docs: int
    avgdl: float
    df_map: dict = field(repr=False, default_factory=dict)
    dl_map: dict = field(repr=False, default_factory=dict)


def build_oracle_index(corpus: pd.DataFrame, doc_col="doc_id", text_col="text", **tok) -> OracleIndex:
    toks = tokenize_pandas(corpus[text_col], **tok)
    rows = []
    for doc, tl in zip(corpus[doc_col], toks):
        if tl:
            c = pd.Series(tl).value_counts()
            for t, n in c.items():
                rows.append((t, doc, int(n)))
    postings = pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
    terms = (
        postings.groupby("term")
        .agg(df=("doc_id", "nunique"), cf=("tf", "sum"))
        .reset_index()
    )
    doclen = postings.groupby("doc_id").agg(dl=("tf", "sum")).reset_index()
    n_docs = len(corpus)
    avgdl = float(doclen["dl"].sum()) / n_docs if n_docs else 0.0
    return OracleIndex(
        postings=postings,
        terms=terms,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        df_map=dict(zip(terms["term"], terms["df"])),
        dl_map=dict(zip(doclen["doc_id"], doclen["dl"])),
    )


def sim_score(sim: Similarity, tf: float, df: int, dl: int, n: int, avgdl: float) -> float:
    if sim.kind == "bm25":
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) if sim.use_idf else 1.0
        if sim.use_tf:
            if sim.use_norm:
                tf_part = tf * (sim.k1 + 1.0) / (tf + sim.k1 * (1 - sim.b + sim.b * dl / avgdl))
            else:
                tf_part = tf * (sim.k1 + 1.0) / (tf + sim.k1)
        else:
            tf_part = 1.0 if tf > 0 else 0.0
        return idf * tf_part
    idf = math.log(n / (df + 1.0)) + 1.0 if sim.use_idf else 1.0
    tf_part = math.sqrt(tf) if sim.use_tf else (1.0 if tf > 0 else 0.0)
    norm = 1.0 / math.sqrt(dl) if sim.use_norm else 1.0
    return tf_part * idf * norm


def score_query(
    oi: OracleIndex,
    terms_boosts: list[tuple[str, float]],
    sim: Similarity,
    min_should_match: int = 1,
) -> pd.DataFrame:
    """(doc_id, score, matched) for a boosted OR bag."""
    acc: dict[int, float] = {}
    matched: dict[int, int] = {}
    for term, boost in terms_boosts:
        df = oi.df_map.get(term)
        if df is None:
            continue
        plist = oi.postings[oi.postings["term"] == term]
        for doc, tf in zip(plist["doc_id"], plist["tf"]):
            s = boost * sim_score(sim, float(tf), int(df), int(oi.dl_map[doc]), oi.n_docs, oi.avgdl)
            acc[doc] = acc.get(doc, 0.0) + s
            matched[doc] = matched.get(doc, 0) + 1
    out = pd.DataFrame(
        {"doc_id": list(acc), "score": list(acc.values()), "matched": [matched[d] for d in acc]}
    )
    return out[out["matched"] >= min_should_match].reset_index(drop=True)


def topk(scored: pd.DataFrame, k: int, round_to: int = 5) -> pd.DataFrame:
    s = scored.copy()
    s["score"] = np.round(s["score"].astype(float), round_to)
    s = s.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable").head(k)
    return s[["doc_id", "score"]].reset_index(drop=True)
