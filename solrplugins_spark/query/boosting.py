"""Query-side weighted synonym expansion — the QueryBoostingQParser
pipeline re-expressed.

Reference flow (QueryBoostingQParser.java:27-60 +
PayloadQueryBoostTokenFilter.java:33-56):
  1. spaces -> commas so multi-word synonym surfaces survive
     whitespace tokenization (:29)
  2. the analysis chain maps each surface to weighted expansions
     (index-time synonym filter emitting `expansion^payload` tokens;
     payload 0 and scientific-notation payloads skipped, :41-48)
  3. every expanded token becomes a boosted TermQuery (:51-60)

Engine shape: the synonym dictionary is a small DataFrame
(surface, expansion, weight); expansion is a driver-side rewrite of
the query's term bag (queries are tiny), producing the boosted-OR
bag that search_terms/score_terms already execute. Multi-word
surfaces are greedily matched left-to-right, longest first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..analysis.tokenizer import tokenize_pandas
from ..index.builder import InvertedIndex
from .scorer import BM25, Similarity, search_terms

import pandas as pd


def _skip_weight(w: float) -> bool:
    """PayloadQueryBoostTokenFilter skip rules: zero payloads and
    payloads that would render in scientific notation (:41-48)."""
    return w == 0.0 or "e-" in repr(float(w)).lower()


def load_synonyms(rows: list[tuple[str, str, float]]) -> dict[str, list[tuple[str, float]]]:
    """(surface, expansion, weight) rows -> surface -> expansions map.
    Surfaces normalized to single-space lowercase token runs."""
    out: dict[str, list[tuple[str, float]]] = {}
    for surface, expansion, weight in rows:
        key = " ".join(tokenize_pandas(pd.Series([surface]))[0])
        out.setdefault(key, []).append((expansion.lower(), float(weight)))
    return out


def expand_terms(
    query: str, synonyms: dict[str, list[tuple[str, float]]]
) -> list[tuple[str, float]]:
    """Token bag with synonym expansions as boosted extra terms.

    Greedy longest-match over the token sequence (the space->comma
    trick exists to keep multi-word surfaces intact; matching on the
    token sequence is the same semantics). Original tokens keep boost
    1.0; each expansion adds (expansion, weight) unless skipped by the
    payload rules.
    """
    toks = list(tokenize_pandas(pd.Series([query]))[0])
    max_len = max((len(k.split()) for k in synonyms), default=1)
    out: list[tuple[str, float]] = []
    i = 0
    while i < len(toks):
        matched = False
        for ln in range(min(max_len, len(toks) - i), 0, -1):
            surface = " ".join(toks[i : i + ln])
            if surface in synonyms:
                # surface tokens stay in the query (SHOULD), expansions add on
                for t in toks[i : i + ln]:
                    out.append((t, 1.0))
                for exp, w in synonyms[surface]:
                    if not _skip_weight(w):
                        out.append((exp, w))
                i += ln
                matched = True
                break
        if not matched:
            out.append((toks[i], 1.0))
            i += 1
    # merge duplicate terms by summing boosts (BooleanQuery SHOULD stacking)
    merged: dict[str, float] = {}
    for t, w in out:
        merged[t] = merged.get(t, 0.0) + w
    return sorted(merged.items())


def boosted_synonym_search(
    index: InvertedIndex,
    query: str,
    synonyms: dict[str, list[tuple[str, float]]],
    k: int = 10,
    sim: Similarity = BM25,
) -> DataFrame:
    boosts = expand_terms(query, synonyms)
    if not boosts:
        return index.postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    return search_terms(index, boosts, k=k, sim=sim)
