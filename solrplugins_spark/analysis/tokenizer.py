"""Tokenization — the engine's analyzer chain.

Reference semantics: Solr analyzer chains feed every plugin
(TermExtractionHelper.java:23-62 — analyzer -> TokenStream -> terms;
MoreLikeThis.java:1188-1250 — noise-word length bounds + stopwords +
token cap). Here the *hot path* is pure JVM column expressions
(lower + regexp split + filter) so index builds stay inside
whole-stage codegen; the pandas-UDF variant exists for filter chains
the built-ins can't express (see filters.py) and is Arrow-batched,
never per-row.

The canonical token grammar is ``[a-z0-9]+`` over lowercased text.
This exact grammar is mirrored in every DuckDB oracle
(regexp_split_to_array(lower(text), '[^a-z0-9]+')) so Spark results
and oracle results tokenize identically.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Split pattern: anything that is not a lowercase alnum ends a token.
TOKEN_PATTERN = "[^a-z0-9]+"


def tokens_col(
    text: Column | str,
    min_len: int = 1,
    max_len: int = 64,
    stopwords: Iterable[str] | None = None,
    max_tokens: int | None = None,
) -> Column:
    """array<string> of tokens from a text column, JVM-side only.

    min_len/max_len ≙ MoreLikeThis.isNoiseWord length bounds
    (MoreLikeThis.java:1241-1250); stopwords ≙ the stopword set;
    max_tokens ≙ maxNumTokensParsedPerField (MoreLikeThis.java:1204-1208).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), TOKEN_PATTERN)
    toks = F.filter(toks, lambda t: (F.length(t) >= min_len) & (F.length(t) <= max_len))
    if stopwords:
        stop_arr = F.array(*[F.lit(s) for s in sorted(set(stopwords))])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    return toks


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    **kwargs,
) -> DataFrame:
    """Attach a tokens array column (declarative; Catalyst optimizes)."""
    return df.withColumn(out_col, tokens_col(text_col, **kwargs))


def tokenize_pandas(
    series: pd.Series,
    min_len: int = 1,
    max_len: int = 64,
    stopwords: set[str] | None = None,
    max_tokens: int | None = None,
) -> pd.Series:
    """Pandas-side tokenizer with IDENTICAL semantics to tokens_col.

    Used by the brute-force oracle scorer in tests and by pandas-UDF
    filter-chain stages. Vectorized (str.lower + str.split), no
    per-row Python beyond the list comprehension over token lists.
    """
    import re

    pat = re.compile(TOKEN_PATTERN)

    def tok(s: str) -> list[str]:
        if s is None:
            return []
        out = [t for t in pat.split(s.lower()) if min_len <= len(t) <= max_len]
        if stopwords:
            out = [t for t in out if t not in stopwords]
        if max_tokens is not None:
            out = out[:max_tokens]
        return out

    return series.map(tok)


def counted_terms(
    df: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    arrow: bool = True,
    positions: bool = False,
    **tok_kwargs,
) -> DataFrame:
    """(doc_id, term, tf) — the addTermWeights aggregation
    (MoreLikeThis.java:1156-1233).

    Default path (``arrow=True``): ONE shuffle-free mapInPandas pass —
    per-doc term counting is partition-local (a doc lives in exactly
    one partition), so tokenize + count happens inside an Arrow batch
    with zero exchange. This is the Lucene-style per-doc inversion:
    the only shuffles in an index build are the (vocab-bounded) term
    dictionary agg and the segment groupBy. At 10^12 turns this
    removes the dominant exploded-token shuffle entirely.

    ``arrow=False`` keeps the pure-JVM explode + partial/final hash
    agg variant (useful as a cross-check; it shuffles exploded rows).
    """
    if not arrow:
        toks = tokenize(df.select(doc_col, text_col), text_col, **tok_kwargs)
        return (
            toks.select(F.col(doc_col).alias("doc_id"), F.explode("tokens").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    import re

    import numpy as np

    min_len = tok_kwargs.get("min_len", 1)
    max_len = tok_kwargs.get("max_len", 64)
    stopwords = tok_kwargs.get("stopwords") or None
    max_tokens = tok_kwargs.get("max_tokens")
    stop = set(stopwords) if stopwords else None
    pat = re.compile(TOKEN_PATTERN)

    def count_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[text_col].fillna("").str.lower().str.split(pat)
            flat = np.concatenate([t if t else [""] for t in toks])
            lens = np.array([len(t) if t else 1 for t in toks])
            docs = np.repeat(pdf[doc_col].to_numpy(), lens)
            out = pd.DataFrame({"doc_id": docs, "term": flat})
            tl = out["term"].str.len()
            out = out[(tl >= min_len) & (tl <= max_len)]
            if stop:
                out = out[~out["term"].isin(stop)]
            if max_tokens is not None:
                out = out[out.groupby("doc_id").cumcount() < max_tokens]
            if len(out) == 0:
                continue
            if positions:
                # token position within the doc (post-filter index) —
                # powers exact phrase adjacency (Lucene positions)
                out = out.assign(pos=out.groupby("doc_id", sort=False).cumcount())
                counted = (
                    out.groupby(["doc_id", "term"], sort=False)
                    .agg(tf=("pos", "size"), positions=("pos", list))
                    .reset_index()
                )
            else:
                counted = (
                    out.groupby(["doc_id", "term"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )
            # dl carried inline: per-doc token count (sum of tfs) — lets
            # the scorer read dl without a doclen join (one less shuffle
            # per query) and keeps doclen derivation shuffle-free
            counted["dl"] = counted.groupby("doc_id", sort=False)["tf"].transform("sum")
            if positions:
                counted = counted[["doc_id", "term", "tf", "dl", "positions"]]
            yield counted

    schema = "doc_id long, term string, tf long, dl long"
    if positions:
        schema += ", positions array<int>"
    return df.select(F.col(doc_col).alias("doc_id"), text_col).mapInPandas(
        count_batches, schema=schema
    )
