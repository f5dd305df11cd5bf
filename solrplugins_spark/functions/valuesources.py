"""Function queries — the reference's ValueSource library, as column
expressions over the forward index.

Reference (functionqueries/*.java), all evaluated per docID against
term vectors; here they're pure Catalyst expressions over
``fwd = forward_index(docs)`` with columns
(doc_id, terms: array<struct<term,tf>> [term-sorted], dl):

- termfreq(t)            tf of t in doc (Lucene built-in the parsers
                         compose with)
- binarytermexists(t)    min(1, tf) — BinaryTermExistsValueSource.java:148
- fieldlen               unique-term count (term-vector size path,
                         FieldLenValueSource.java:55-69); total-token
                         variant = the re-analysis path (:74-108)
- fieldval               unique terms joined by '||' in term-sorted
                         order — FieldIndexedValueSource.java:29-75
- termintersect(sim)     |doc∩param| normalized 4 ways —
                         TermIntersectsValueSource.java:70-96,
                         names from SimilarityType.java:8-17
- termoverlap            Σ binarytermexists / (fieldlen | #param terms)
                         — TermOverlapValueSourceParser.java:44-59
                         (param terms deduped, :83-99)

All of these stay inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _term_strings(terms_col: str = "terms") -> Column:
    return F.transform(F.col(terms_col), lambda s: s["term"])


def _tf_map(terms_col: str = "terms") -> Column:
    return F.map_from_entries(F.col(terms_col))


def term_freq(term: str, terms_col: str = "terms") -> Column:
    """tf(term) in the doc; 0 when absent."""
    return F.coalesce(
        F.element_at(_tf_map(terms_col), F.lit(term)), F.lit(0)
    ).cast("long")


def binary_term_exists(term: str, terms_col: str = "terms") -> Column:
    """min(1, tf) — BinaryTermExistsValueSource.java:148."""
    return F.least(F.lit(1), term_freq(term, terms_col)).cast("long")


def field_len(terms_col: str = "terms", unique: bool = True) -> Column:
    """unique=True: term-vector size (#unique terms); unique=False:
    total token count (the re-analysis fallback's semantics)."""
    if unique:
        return F.size(F.col(terms_col)).cast("long")
    return F.aggregate(
        F.col(terms_col), F.lit(0).cast("long"), lambda acc, s: acc + s["tf"]
    )


def field_val(terms_col: str = "terms") -> Column:
    """unique terms joined by '||', term-sorted (TermsEnum order)."""
    return F.array_join(_term_strings(terms_col), "||")


def term_intersect(
    param_terms: list[str], similarity: str = "jaccard", terms_col: str = "terms"
) -> Column:
    """Set similarity between doc terms and a param term set.

    similarity ∈ {jaccard, doc, param, dice}; empty docs score 0
    (TermIntersectsValueSource.java:60-96).
    """
    params = F.array(*[F.lit(t) for t in sorted(set(param_terms))])
    doc_terms = _term_strings(terms_col)
    inter = F.size(F.array_intersect(doc_terms, params)).cast("double")
    doc_n = F.size(doc_terms).cast("double")
    param_n = F.lit(float(len(set(param_terms))))
    if similarity == "jaccard":
        expr = inter / F.size(F.array_union(doc_terms, params))
    elif similarity == "doc":
        expr = inter / doc_n
    elif similarity == "param":
        expr = inter / param_n
    elif similarity == "dice":
        expr = (2 * inter) / (doc_n + param_n)
    else:
        raise ValueError(f"unknown similarity {similarity!r}")
    return F.when(doc_n > 0, expr).otherwise(F.lit(0.0))


def term_overlap(
    param_terms: list[str], use_doc_length: bool = False, terms_col: str = "terms"
) -> Column:
    """Σ binarytermexists(t) / denominator.

    denominator = fieldlen (unique-term count) if use_doc_length else
    the number of (deduped) param terms."""
    uniq = sorted(set(param_terms))
    if not uniq:
        return F.lit(0.0)
    total = F.size(
        F.array_intersect(_term_strings(terms_col), F.array(*[F.lit(t) for t in uniq]))
    ).cast("double")
    denom = (
        field_len(terms_col, unique=True).cast("double")
        if use_doc_length
        else F.lit(float(len(uniq)))
    )
    return total / denom


FUNCTION_REGISTRY = {
    "termfreq": term_freq,
    "binarytermexists": binary_term_exists,
    "fieldlen": field_len,
    "fieldval": field_val,
    "termintersect": term_intersect,
    "termoverlap": term_overlap,
}


def with_function(fwd: DataFrame, name: str, out_col: str, *args, **kwargs) -> DataFrame:
    """Attach a registered function-query column to a forward-index frame
    (the ValueSourceParser registry equivalent, SURVEY.md §2.10)."""
    return fwd.withColumn(out_col, FUNCTION_REGISTRY[name](*args, **kwargs))
