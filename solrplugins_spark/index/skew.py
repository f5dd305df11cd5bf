"""Skew handling: explicit salting for head-term aggregations.

The transcripts corpus is Zipf-skewed (BASELINE.json north rule calls
for "explicit salting and skew-aware repartitioning for head terms").
The engine's primary defenses are structural:

  - the flat build never shuffles on term for posting rows (per-doc
    inversion, builder.py) — a stop word cannot hot-spot a task;
  - the packed build groups by (segment, term), so a head term splits
    into one bounded group per doc-range segment (<= seg_size docs);
  - the dictionary agg ships vocab-bounded pandas partials.

This module adds the *explicit* two-phase salt for the cases where a
term-keyed grouped-map genuinely has to see whole groups (e.g. global
per-term statistics with applyInPandas at extreme df): phase 1 groups
on (term, salt) where salt = hash(doc_id) % n_salts, phase 2 merges
the per-salt partials. AQE's skew-join splitting handles *joins*;
this handles *grouped aggregation*, which AQE does not split.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_term_agg(
    postings: DataFrame,
    partial_exprs: dict[str, F.Column] | None = None,
    merge_exprs: dict[str, F.Column] | None = None,
    n_salts: int = 16,
    salt_threshold_df: int | None = None,
    terms_df: DataFrame | None = None,
) -> DataFrame:
    """Two-phase per-term aggregation with head-term salting.

    Default stats: df (count) and cf (sum tf) — the term dictionary.
    When ``salt_threshold_df``+``terms_df`` are given, only terms with
    df >= threshold are salted (cold terms take the direct path and
    skip the second shuffle).
    """
    partial_exprs = partial_exprs or {
        "df": F.count(F.lit(1)),
        "cf": F.sum("tf"),
    }
    merge_exprs = merge_exprs or {
        "df": F.sum("df"),
        "cf": F.sum("cf"),
    }
    salted = postings.withColumn(
        "_salt", F.pmod(F.hash("doc_id"), F.lit(n_salts))
    )
    if salt_threshold_df is not None and terms_df is not None:
        hot = terms_df.filter(F.col("df") >= salt_threshold_df).select("term")
        hot_rows = salted.join(F.broadcast(hot), "term", "left_semi")
        cold_rows = salted.join(F.broadcast(hot), "term", "left_anti").withColumn(
            "_salt", F.lit(0)
        )
        salted = hot_rows.unionByName(cold_rows)
    phase1 = salted.groupBy("term", "_salt").agg(
        *[e.alias(name) for name, e in partial_exprs.items()]
    )
    return phase1.groupBy("term").agg(
        *[e.alias(name) for name, e in merge_exprs.items()]
    )


def salted_grouped_map(
    postings: DataFrame,
    func: Callable,
    schema: str,
    n_salts: int = 16,
) -> DataFrame:
    """applyInPandas over (term, salt) groups — bounds any single
    task's group to ~df/n_salts rows for head terms. ``func`` receives
    one (term, salt) slice; a second merge pass is the caller's job
    (posting-codec merges are associative by construction)."""
    return (
        postings.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(n_salts)))
        .groupBy("term", "_salt")
        .applyInPandas(func, schema=schema)
    )
