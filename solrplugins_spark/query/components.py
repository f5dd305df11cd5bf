"""Solr search components over a query's matched docset: range
faceting (``facet.range`` — RangeFacetProcessor) and field stats
(``stats=true&stats.field=...`` — StatsComponent /
StatsValuesFactory). Flat-path twins of
index.segments.wand_facet_range_search / wand_stats_search: the
matched docset joins the corpus's numeric column, then one bounded
agg — bucket counts are n_buckets rows, stats is one row, regardless
of match count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex
from .compiler import compile_ast
from .parser import parse_query


def _matched_values(
    index: InvertedIndex, query: str, values_df: DataFrame, col: str
) -> DataFrame:
    tree, _errors = parse_query(query)
    matched = compile_ast(index, tree).select("doc_id")
    return matched.join(values_df.select("doc_id", col), "doc_id")


def facet_range_search(
    index: InvertedIndex,
    query: str,
    values_df: DataFrame,
    facet_col: str,
    start: int,
    end: int,
    gap: int,
) -> DataFrame:
    """Counts of matching docs per ``[start + i*gap, start +
    (i+1)*gap)`` bucket of ``facet_col``. Zero-count buckets included
    (Solr returns the full lattice); values outside [start, end)
    ignored (facet.range.other=NONE). Returns (bucket, cnt) ordered
    by bucket — ``bucket`` is the range's inclusive lower bound."""
    if gap <= 0 or end <= start:
        raise ValueError("facet.range needs gap > 0 and end > start")
    n_buckets = -(-(end - start) // gap)
    j = _matched_values(index, query, values_df, facet_col)
    b = F.floor((F.col(facet_col) - F.lit(start)) / F.lit(gap))
    counts = (
        # the explicit v < end keeps a non-gap-aligned range honest:
        # the last bucket never swallows values in [end, start+nb*gap)
        j.filter((F.col(facet_col) >= start) & (F.col(facet_col) < end))
        .select(b.alias("ord"))
        .filter((F.col("ord") >= 0) & (F.col("ord") < n_buckets))
        .groupBy("ord")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lattice = index.postings.sparkSession.range(n_buckets).select(
        F.col("id").alias("ord")
    )
    return (
        lattice.join(counts, "ord", "left")
        .select(
            (F.lit(int(start)) + F.col("ord") * F.lit(int(gap))).alias("bucket"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("bucket")
    )


def enum_terms(
    terms: DataFrame,
    prefix: str = "",
    limit: int = 10,
    sort: str = "count",
    min_count: int = 1,
) -> DataFrame:
    """The one TermsComponent enumeration, shared by both tiers:
    prefix + mincount filters over a ``(term, df, cf)`` frame, then
    ``sort="count"`` (df desc, term asc — Solr's default) or
    ``sort="index"`` (term asc), limit -> TakeOrderedAndProject."""
    t = terms.select("term", "df", "cf")
    if prefix:
        t = t.filter(F.col("term").startswith(prefix))
    if min_count > 1:
        t = t.filter(F.col("df") >= min_count)
    if sort == "count":
        t = t.orderBy(F.desc("df"), F.asc("term"))
    elif sort == "index":
        t = t.orderBy(F.asc("term"))
    else:
        raise ValueError(f"terms.sort must be 'count' or 'index', got {sort!r}")
    return t.limit(limit)


def terms_enum(
    index: InvertedIndex,
    prefix: str = "",
    limit: int = 10,
    sort: str = "count",
    min_count: int = 1,
) -> DataFrame:
    """Solr TermsComponent (``/terms``: terms.prefix / terms.sort /
    terms.mincount): enumerate dictionary terms under a prefix with
    their df (Solr's /terms count) and cf.

    One pruned scan of the (cached, term-sorted) dictionary frame +
    TakeOrderedAndProject — the corpus and postings are never
    touched. The packed tier's twin is
    ``index.dictionary.wand_terms_enum``: the same ``enum_terms``
    over the termstats sidecar, whose range-partitioned term-sorted
    files make the prefix a row-group-prunable range predicate."""
    return enum_terms(
        index.terms, prefix=prefix, limit=limit, sort=sort, min_count=min_count
    )


def facet_query_search(
    index: InvertedIndex, query: str, facet_queries: dict[str, str]
) -> DataFrame:
    """Solr ``facet.query`` (SimpleFacets.getFacetQueryCounts): for
    each named subquery, the count of docs matching BOTH the main
    query and that subquery. Zero counts are served (Solr returns
    every requested facet.query). Returns (name, cnt) ordered by name.

    Plan: ONE job — the subquery docsets union with a name tag and
    join the main docset a single time, so the main query's plan
    evaluates once no matter how many facet queries ride on it; the
    groupBy(name) count is |facet_queries|-bounded, and a names
    lattice left-join restores the zero counts Solr serves."""
    if not facet_queries:
        raise ValueError("facet.query needs at least one named subquery")
    tree, _errors = parse_query(query)
    main = compile_ast(index, tree).select("doc_id")
    tagged = None
    for name, fq in facet_queries.items():
        fq_tree, _e = parse_query(fq)
        f = (
            compile_ast(index, fq_tree)
            .select("doc_id")
            .withColumn("name", F.lit(name))
        )
        tagged = f if tagged is None else tagged.unionByName(f)
    counts = (
        main.join(tagged, "doc_id")
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lattice = main.sparkSession.createDataFrame(
        [(n,) for n in facet_queries], "name string"
    )
    return (
        lattice.join(counts, "name", "left")
        .select("name", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .orderBy("name")
    )


def stats_facet_search(
    index: InvertedIndex,
    query: str,
    values_df: DataFrame,
    stats_col: str,
    facet_col: str,
    round_to: int = 5,
) -> DataFrame:
    """Solr ``stats.facet`` (StatsComponent per-bucket stats): the
    stats_search aggregate computed separately for every value of
    ``facet_col`` over the main query's matched docset. One row per
    facet value holding count / min / max / sum / mean / sample
    stddev of ``stats_col``; buckets with no match are absent (Solr
    omits empty facet buckets). Ordered by facet value.

    Plan: matched docset joins the two columns, then ONE
    groupBy(facet_col) — output is |facet vocabulary| rows, never the
    match set. The packed twin is wand_stats_facet_search (per-segment
    per-ordinal moment rows merged by value)."""
    tree, _errors = parse_query(query)
    matched = compile_ast(index, tree).select("doc_id")
    j = matched.join(
        values_df.select("doc_id", stats_col, facet_col), "doc_id"
    )
    v = F.col(stats_col).cast("double")
    # single-match buckets: stddev_samp is NaN in Spark, NULL in SQL
    # engines and the packed moment merge — normalize (stats_search's
    # rule applied per bucket)
    stddev = F.when(
        F.count(F.lit(1)) > 1, F.round(F.stddev_samp(v), round_to)
    )
    return (
        j.groupBy(facet_col)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(stats_col).cast("long").alias("min_v"),
            F.max(stats_col).cast("long").alias("max_v"),
            F.sum(stats_col).cast("long").alias("sum_v"),
            F.round(F.avg(v), round_to).alias("mean_v"),
            stddev.alias("stddev_v"),
        )
        .orderBy(facet_col)
    )


def percentiles_from_hist(hist: DataFrame, percentiles: list[float]) -> DataFrame:
    """(pct, value) exact percentiles from a (value, cnt) histogram —
    the k-th-SMALLEST rule with k = ceil(p * n) (an actual data value,
    never interpolated; the same deterministic rule text/lm.py's
    ppl_bucket thresholds use, so the DuckDB oracle mirrors it via
    list ordering). One bounded cumulative pass: the histogram is
    |distinct values| rows, orders of magnitude below the match set;
    the single-partition window is over that bounded frame only."""
    from pyspark.sql import Window

    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentiles must be in (0, 1], got {p}")
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    n_df = hist.agg(F.sum("cnt").alias("n"))
    cum = hist.select(
        "value", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(n_df))
    # ONE pass for every requested percentile (r07; was one filter+agg
    # job per p): join the bounded cumulative frame against the tiny
    # percentile lattice (broadcast nested-loop on the >= condition)
    # and take min(value) per pct — identical k-th-smallest semantics,
    # p jobs -> 1.
    spark = hist.sparkSession
    lattice = spark.createDataFrame(
        [(float(p),) for p in sorted(set(percentiles))], "pct double"
    )
    return (
        F.broadcast(lattice)
        .join(cum, F.col("cum") >= F.ceil(F.col("n") * F.col("pct")))
        .groupBy("pct")
        .agg(F.min("value").alias("value"))
        .orderBy("pct")
    )


def stats_percentiles_search(
    index: InvertedIndex,
    query: str,
    values_df: DataFrame,
    stats_col: str,
    percentiles: list[float],
) -> DataFrame:
    """Solr StatsComponent ``percentiles`` over the matched docset —
    served EXACTLY (Solr approximates with t-digest; this engine's
    docvalues columns are bounded-cardinality ints, so an exact
    (value, cnt) histogram is smaller than a digest would be). One
    groupBy(value) histogram agg + the bounded cumulative pass.
    Returns (pct, value) ordered by pct. For a genuinely
    unbounded-cardinality column, swap the histogram agg for a
    mergeable digest — the percentile derivation stays the same."""
    j = _matched_values(index, query, values_df, stats_col)
    hist = (
        j.groupBy(F.col(stats_col).cast("long").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return percentiles_from_hist(hist, percentiles)


def stats_search(
    index: InvertedIndex,
    query: str,
    values_df: DataFrame,
    stats_col: str,
    round_to: int = 5,
) -> DataFrame:
    """One row: count / min / max / sum / mean / sample stddev of
    ``stats_col`` over the matched docset — StatsValuesFactory's
    corrected-stddev formula, matching stddev_samp in every SQL
    engine. Empty docset -> empty frame (Solr omits the section)."""
    j = _matched_values(index, query, values_df, stats_col)
    v = F.col(stats_col).cast("double")
    # single-match docsets: Spark's stddev_samp returns NaN where SQL
    # engines (and the packed moment merge) return NULL — normalize
    # to NULL so flat == packed == oracle on every docset size
    stddev = F.when(
        F.count(F.lit(1)) > 1, F.round(F.stddev_samp(v), round_to)
    )
    return (
        j.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(stats_col).cast("long").alias("min_v"),
            F.max(stats_col).cast("long").alias("max_v"),
            F.sum(stats_col).cast("long").alias("sum_v"),
            F.round(F.avg(v), round_to).alias("mean_v"),
            stddev.alias("stddev_v"),
        )
        .filter(F.col("cnt") > 0)
    )
