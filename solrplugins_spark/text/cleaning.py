"""Training-data cleaning operators: PII redaction, repetition
features, benchmark contamination.

Not in the reference (a search plugin suite); these are the curation
steps a 10^12-turn training corpus runs before indexing. All hot paths
are JVM column expressions (regexp / array ops, one scan per
operator); the contamination check's only shuffle is the bounded
benchmark-ngram semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.tokenizer import tokens_col

# Conservative, engine-portable patterns (Java regex == RE2 semantics
# for these constructs — mirrored verbatim in the DuckDB oracles).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\+?\d{3}[\- ]\d{3}[\- ]\d{4}\b",
}


def redact_pii(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, redacted, n_<kind>...) — replace each PII match with a
    typed marker and count matches per kind. Pure regexp column
    expressions: one codegen'd scan, no UDFs, trivially parallel at
    any scale."""
    patterns = patterns or PII_PATTERNS
    redacted = F.col(text_col)
    counts = []
    for kind, pat in patterns.items():
        counts.append(
            F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), pat)) - 1
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    out = docs.select(
        F.col(doc_col).alias("doc_id"),
        redacted.alias("redacted"),
        *[
            c.cast("long").alias(f"n_{kind}")
            for c, kind in zip(counts, patterns)
        ],
    )
    return out


def repetition_features(
    docs: DataFrame,
    n: int = 2,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dup_ngram_frac, top_ngram_frac) — the Gopher-style
    repetition signals: fraction of n-gram occurrences that are
    duplicates (1 - distinct/total) and the share of the single most
    frequent n-gram. Array expressions over the tokens column — no
    shuffle, no UDF."""
    toks = tokens_col(text_col)
    idxs = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idxs, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size("_grams").cast("double")
    distinct = F.size(F.array_distinct("_grams")).cast("double")
    # most frequent n-gram count: max over distinct grams of the
    # occurrence count (aggregate over the distinct array)
    top_count = F.array_max(
        F.transform(
            F.array_distinct("_grams"),
            lambda g: F.size(F.filter("_grams", lambda x: x == g)),
        )
    ).cast("double")
    return (
        docs.select(F.col(doc_col).alias("doc_id"), grams.alias("_grams"))
        .select(
            "doc_id",
            F.when(total > 0, F.round(1.0 - distinct / total, 5))
            .otherwise(F.lit(0.0))
            .alias("dup_ngram_frac"),
            F.when(total > 0, F.round(top_count / total, 5))
            .otherwise(F.lit(0.0))
            .alias("top_ngram_frac"),
        )
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    doc_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_contaminated, contamination, contaminated)
    — fraction of each doc's distinct n-grams that appear anywhere in
    the ``benchmark`` corpus; flag docs at/above ``threshold``
    (decontamination against eval sets).

    Scale shape: benchmark n-grams are a distinct, typically
    broadcastable set; the join is ngram-keyed (skew-bounded by
    dedup), then a per-doc count agg — one shuffle each side, never
    doc x benchmark."""
    def grams(col):
        toks = tokens_col(col)
        idxs = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(idxs, lambda i: F.array_join(F.slice(toks, i, n), " "))
            ),
        ).otherwise(F.array().cast("array<string>"))

    bench_grams = (
        benchmark.select(F.explode(grams(bench_text_col)).alias("ng"))
        .dropDuplicates(["ng"])
    )
    doc_grams = docs.select(
        F.col(doc_col).alias("doc_id"), F.explode(grams(text_col)).alias("ng")
    )
    totals = doc_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        doc_grams.join(bench_grams, "ng", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .fillna({"n_contaminated": 0})
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 5).alias(
                "contamination"
            ),
            (F.col("n_contaminated") / F.col("n_grams") >= threshold).alias(
                "contaminated"
            ),
        )
    )
