"""Suggesters: case-variant lookup and canonicalizing suggestion merge.

Reference:
- DiceMultipleCaseSuggester.java:200-310 — generate lower/UPPER/Title
  case variants per token (first maxCaseSuggestionLength tokens,
  default 2), look each variant up in the suggestion dictionary, merge
  hits by lowercased key keeping the most frequent surface form and
  summing counts; order alphabetically or by summed count
  (SUGGEST_MORE_POPULAR).
- DiceSuggester.java:141-145 — HighFrequencyDictionary: terms of a
  field with df >= threshold fraction as the suggestion source;
  :240-273 — analyzer-collapsed suggestion merge (canonical key =
  analyzed form), most-frequent surface wins.
- MultipleFileDictionary.java:43-140 — `term\\tfreq` files unioned.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex

_SEP = re.compile(r"[ ,;]")


def _title_case(s: str) -> str:
    """First char upper, rest lower (DiceMultipleCaseSuggester.java:299-307)."""
    if len(s) == 0:
        return s
    if len(s) == 1:
        return s.upper()
    return s[0].upper() + s[1:].lower()


def case_variants(original: str, max_len: int = 2) -> list[str]:
    """All case variants: tokens beyond ``max_len`` keep their original
    case; earlier tokens branch into {lower, UPPER, Title} (Title
    skipped when it collides). Original always included.
    (DiceMultipleCaseSuggester.java:200-236)."""
    tokens = _SEP.split(original)
    choices: list[list[str]] = []
    for i, tok in enumerate(tokens):
        if i >= max_len:
            choices.append([tok])
            continue
        opts = [tok.lower(), tok.upper()]
        tc = _title_case(tok)
        if tc not in opts:
            opts.append(tc)
        choices.append(opts)
    variants = {" ".join(c).strip() for c in itertools.product(*choices)}
    variants.add(original)
    return sorted(variants)


def case_variant_suggest(
    dictionary: DataFrame,
    token_text: str,
    max_len: int = 2,
    popular: bool = False,
) -> DataFrame:
    """Look up every case variant of ``token_text`` in a suggestion
    dictionary (phrase, freq); merge by lowercased key: surface = the
    most frequent variant's key, freq = its value, count = summed
    freq across variants; order alphabetical (default) or by summed
    count desc (popular). (DiceMultipleCaseSuggester.java:233-284)."""
    spark = dictionary.sparkSession
    variants = case_variants(token_text, max_len)
    vdf = spark.createDataFrame([(v,) for v in variants], "phrase string")
    hits = dictionary.join(F.broadcast(vdf), "phrase")
    merged = (
        hits.withColumn("key", F.lower("phrase"))
        .groupBy("key")
        .agg(
            F.max(F.struct("freq", "phrase")).alias("_best"),
            F.sum("freq").alias("count"),
        )
        .select(
            "key",
            F.col("_best.phrase").alias("suggestion"),
            F.col("_best.freq").alias("freq"),
            "count",
        )
    )
    if popular:
        return merged.orderBy(F.desc("count"), F.asc("key"))
    return merged.orderBy(F.asc("key"))


def canonical_suggest(
    dictionary: DataFrame,
    prefix: str,
    count: int = 10,
    popular: bool = True,
) -> DataFrame:
    """Prefix-based suggester with analyzer-canonicalized merge:
    candidates = dictionary phrases whose lowercase starts with the
    lowercased prefix; canonical key = lowercase; keep most frequent
    surface + summed freq (DiceSuggester.java:240-273)."""
    cand = dictionary.filter(F.lower(F.col("phrase")).startswith(prefix.lower()))
    merged = (
        cand.withColumn("key", F.lower("phrase"))
        .groupBy("key")
        .agg(
            F.max(F.struct("freq", "phrase")).alias("_best"),
            F.sum("freq").alias("count"),
        )
        .select(
            "key",
            F.col("_best.phrase").alias("suggestion"),
            "count",
        )
    )
    order = (
        [F.desc("count"), F.asc("key")] if popular else [F.asc("key")]
    )
    return merged.orderBy(*order).limit(count)


def high_frequency_dictionary(
    index: InvertedIndex, threshold: float = 0.0
) -> DataFrame:
    """(phrase, freq) from index terms with df >= threshold*N
    (HighFrequencyDictionary, DiceSuggester.java:141-145)."""
    min_df = threshold * index.n_docs
    return index.terms.filter(F.col("df") >= min_df).select(
        F.col("term").alias("phrase"), F.col("df").alias("freq")
    )


def file_dictionary(spark: SparkSession, paths: list[str]) -> DataFrame:
    """term\\tfreq files -> (phrase, freq); lines without a freq get 1
    (MultipleFileDictionary.java:90-140)."""
    df = (
        spark.read.option("sep", "\t")
        .schema("phrase string, freq long")
        .csv(paths)
    )
    return df.fillna({"freq": 1})
