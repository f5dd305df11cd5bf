"""Token-filter stages — the reference's tokenfilters/ package.

Reference classes (all Java TokenFilters over Lucene TokenStreams):
- ConstantTokenFilter.java:28-36  — every token -> a fixed string
- TypeEraseFilter.java:28-34      — drop the token-type attribute
- ConcatenateTokenFilter.java:68-121 — same-position synonym stacks ->
  cross-product phrases
- PayloadQueryBoostTokenFilter.java:33-56 — `term` -> `term^payload`,
  skipping payload==0 and scientific-notation payloads
- MeanPayloadTokenFilter.java:37-77 — average duplicate-term payloads,
  L2-normalize the mean vector

Here each stage is either a column expression (JVM) or a vectorized
pandas transform composable inside a pandas UDF. Token streams are
modeled as array columns: array<string> for plain tokens,
array<struct<term string, weight float>> for payload-carrying streams.
"""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def constant_token_filter(tokens: Column, constant: str) -> Column:
    """ConstantTokenFilter: map every token to a fixed string.

    Enables counting-by-termfreq tricks (ConstantTokenFilter.java:28-36).
    """
    return F.transform(tokens, lambda _: F.lit(constant))


def type_erase(tokens: Column) -> Column:
    """TypeEraseFilter: token types don't exist in our model — identity.

    Kept for chain parity (TypeEraseFilter.java:28-34); the engine's
    token streams carry no type attribute to erase.
    """
    return tokens


_SCI_NOTATION = re.compile(r"^-?\d+(\.\d+)?[eE]-\d+$")


def payload_boost_tokens(terms: pd.Series, weights: pd.Series) -> pd.Series:
    """PayloadQueryBoostTokenFilter: `term` -> `term^weight`.

    Skips weight==0 and tiny scientific-notation weights
    (PayloadQueryBoostTokenFilter.java:41-48: payloads rendering as
    `E-` are treated as zero and left unboosted).
    """
    out = []
    for t, w in zip(terms, weights):
        # pandas renders missing weights as NaN, not None
        if (
            w is None
            or (isinstance(w, float) and w != w)  # NaN
            or float(w) == 0.0
            or _SCI_NOTATION.match(repr(float(w)))
        ):
            out.append(t)
        else:
            out.append(f"{t}^{float(w):g}")
    return pd.Series(out, index=terms.index)


def concatenate_tokens(position_stacks: list[list[str]], sep: str = " ") -> list[str]:
    """ConcatenateTokenFilter.makePhrases: cross-product of
    same-position synonym stacks into phrases
    (ConcatenateTokenFilter.java:104-120).

    Input: one list per position, each holding the synonym stack at
    that position. Output: all phrases from picking one token per
    position, in stack order (itertools.product == the Java recursion).
    """
    if not position_stacks:
        return []
    return [sep.join(combo) for combo in itertools.product(*position_stacks)]


def mean_payload(terms: pd.Series, weights: pd.Series) -> pd.DataFrame:
    """MeanPayloadTokenFilter: collapse duplicate terms by averaging
    their payloads, then L2-normalize the mean-payload vector
    (MeanPayloadTokenFilter.java:65 mean, :71-75 normalize).

    Returns a DataFrame (term, weight) with one row per distinct term,
    first-occurrence order preserved (the Java filter emits tokens in
    first-seen order).
    """
    df = pd.DataFrame({"term": terms.values, "w": weights.values.astype(np.float64)})
    agg = df.groupby("term", sort=False)["w"].mean()
    norm = float(np.sqrt((agg.values**2).sum()))
    if norm > 0:
        agg = agg / norm
    return pd.DataFrame({"term": agg.index, "weight": agg.values})
