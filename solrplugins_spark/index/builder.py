"""Inverted-index build: docID mint, postings, term dictionary, doc stats.

Rebuilds the Lucene primitives every reference plugin consumes:
- term dictionary + df  (ir.docFreq, MoreLikeThis.java:1013)
- N                      (ir.numDocs, MoreLikeThis.java:1012)
- doc length / norms     (DiceDefaultSimilarity.java:90-121 — exact
  int doclen here, NOT the lossy 1-byte SmallFloat encoding; this is a
  documented divergence that only affects norm quantization, not BM25)
- postings               (PostingsEnum, BinaryTermExistsValueSource.java:51-153)
- forward index / term vectors (ir.getTermVectors, MoreLikeThis.java:1113)

Everything is declarative DataFrame ops so Catalyst handles pushdown,
partial aggregation and AQE; the packed/segment representation (codec
+ WAND) lives in segments.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.tokenizer import TOKEN_PATTERN, counted_terms, tokenize


def mint_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    out_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """Dense int64 docIDs by stable sort on ``order_cols``.

    Scale-safe: NOT a single-partition row_number window. Range-
    repartition on the order keys, sort within partitions, then add
    per-partition offsets computed from partition counts (one tiny
    extra job). Result is a total dense ordering independent of the
    partition count — the per-turn text-equality invariant
    (BASELINE.json input_hint) is asserted against this ordering.
    """
    spark = df.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(p, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    )
    # persist pins the (sampled) range boundaries so the count pass and
    # the assign pass see identical partitions
    with_pid = ordered.withColumn("_pid", F.spark_partition_id()).persist()
    counts = with_pid.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = acc
        acc += int(row["count"])
    b_offsets = spark.sparkContext.broadcast(offsets)
    from pyspark.sql import types as T

    schema = T.StructType(
        list(with_pid.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def assign(batches):
        carry = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            pdf[out_col] = b_offsets.value[pid] + carry + np.arange(len(pdf), dtype=np.int64)
            carry += len(pdf)
            yield pdf

    # mapInPandas preserves in-partition order: rows are already sorted
    # within each range partition, so ids are dense + globally ordered.
    return with_pid.mapInPandas(assign, schema=schema).drop("_pid")


@dataclass
class InvertedIndex:
    """The queryable index: flat postings + dictionary + doc stats.

    postings: (term, doc_id, tf)        — term-hash distributed
    terms:    (term, df, cf)            — broadcast-join candidate
    doclen:   (doc_id, dl)              — sort-merge side for scoring
    n_docs, avgdl: corpus scalars (ir.numDocs / field norms inputs)
    """

    postings: DataFrame
    terms: DataFrame
    doclen: DataFrame
    n_docs: int
    avgdl: float
    docs: DataFrame | None = field(default=None, repr=False)
    # driver-side term -> df cache (the Lucene per-reader TermStates
    # cache): repeat queries skip the dictionary-lookup job. Bounded by
    # queried vocabulary; the frames above are immutable so entries
    # never go stale. Absent terms cache as df=0.
    df_cache: dict = field(default_factory=dict, repr=False, compare=False)
    # tokenizer settings and column names the index was built with —
    # the re-analysis paths (MLT seed-doc term extraction,
    # MoreLikeThis.java:1134-1144) must tokenize the SAME stored
    # column identically to the build
    tok_kwargs: dict = field(default_factory=dict, repr=False, compare=False)
    text_col: str = "text"
    doc_col: str = "doc_id"

    def persist(self) -> "InvertedIndex":
        self.postings = self.postings.persist()
        self.terms = self.terms.persist()
        self.doclen = self.doclen.persist()
        return self

    def unpersist(self) -> None:
        for d in (self.postings, self.terms, self.doclen):
            d.unpersist()


def build_index(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
    max_len: int = 64,
    stopwords=None,
    max_tokens: int | None = None,
    positions: bool = False,
) -> InvertedIndex:
    """Build the flat inverted index from a corpus DataFrame.

    One shuffle builds postings (explode -> partial+final count agg on
    (doc_id, term)); terms and doclen derive from postings with
    map-side partial aggs. All counting stays JVM-side.
    """
    tok_kwargs = dict(
        min_len=min_len, max_len=max_len, stopwords=stopwords, max_tokens=max_tokens
    )
    postings = counted_terms(
        docs, doc_col=doc_col, text_col=text_col, positions=positions, **tok_kwargs
    ).persist()

    # Term dictionary: per-partition partial (term -> df, cf) in Arrow
    # workers, then a vocab-bounded JVM final agg. String-keyed hash
    # aggregation is deliberately kept OUT of the JVM: measured on this
    # box, a 32-thread JVM hash agg over exploded tokens is 50x slower
    # than pandas partials (allocation/GC contention); python workers
    # are separate processes and scale linearly.
    def _partial_term_stats(batches):
        acc = []
        for pdf in batches:
            acc.append(
                pdf.groupby("term", sort=False)
                .agg(df=("tf", "size"), cf=("tf", "sum"))
                .reset_index()
            )
        if acc:
            a = pd.concat(acc)
            yield a.groupby("term", sort=False).sum().reset_index()

    terms = (
        postings.mapInPandas(_partial_term_stats, schema="term string, df long, cf long")
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )

    # doclen: dl rides inline in postings; a doc's rows are contiguous
    # within one partition, so dedup is partition-local — only batch
    # boundaries can split a doc, handled by carrying the previous
    # batch's last doc id. Zero shuffles.
    def _dedup_doclen(batches):
        prev_last = None
        for pdf in batches:
            out = pdf[["doc_id", "dl"]].drop_duplicates("doc_id")
            if prev_last is not None:
                out = out[out["doc_id"] != prev_last]
            if len(pdf):
                prev_last = pdf["doc_id"].iloc[-1]
            if len(out):
                yield out

    doclen = postings.mapInPandas(_dedup_doclen, schema="doc_id long, dl long")

    # N counts every doc, including empty-token docs that have no postings
    n_docs = docs.count()
    total_tokens = postings.agg(F.sum("tf")).collect()[0][0] or 0
    avgdl = float(total_tokens) / n_docs if n_docs else 0.0
    return InvertedIndex(
        postings=postings,
        terms=terms,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=avgdl,
        docs=docs,
        tok_kwargs=tok_kwargs,
        text_col=text_col,
        doc_col=doc_col,
    )


def corpus_term_stats(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 1,
    max_len: int = 64,
    stopwords=None,
    max_tokens: int | None = None,
) -> DataFrame:
    """(term, df, cf) dictionary stats straight from the corpus —
    tokenize + per-doc tf + per-partition df/cf partials fused in ONE
    Arrow stage, followed by the vocab-bounded final agg.

    This is the dictionary-only build (ir.docFreq/totalTermFreq inputs,
    MoreLikeThis.java:1013/1156) for workloads that never materialize
    postings: IDF-only scoring, MLT df lookups, dictionary suggesters.
    Identical results to ``build_index(...).terms`` (asserted in
    tests/test_index.py) but with ~5x less Arrow-pipe traffic: token-
    level rows never cross the JVM<->python boundary — each partition
    emits at most |vocab| partial rows. At 10^12 turns the shuffle is
    |vocab| * partitions rows instead of the postings frame.
    """
    import re

    stop = set(stopwords) if stopwords else None
    pat = re.compile(TOKEN_PATTERN)

    def stats_batches(batches):
        accs = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[text_col].fillna("").str.lower().str.split(pat)
            flat = np.concatenate([t if t else [""] for t in toks])
            lens = np.array([len(t) if t else 1 for t in toks])
            rows = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            out = pd.DataFrame({"d": rows, "term": flat})
            tl = out["term"].str.len()
            out = out[(tl >= min_len) & (tl <= max_len)]
            if stop:
                out = out[~out["term"].isin(stop)]
            if max_tokens is not None:
                out = out[out.groupby("d").cumcount() < max_tokens]
            if len(out) == 0:
                continue
            per_doc = (
                out.groupby(["d", "term"], sort=False).size().reset_index(name="tf")
            )
            accs.append(
                per_doc.groupby("term", sort=False)
                .agg(df=("tf", "size"), cf=("tf", "sum"))
                .reset_index()
            )
        if accs:
            yield pd.concat(accs).groupby("term", sort=False).sum().reset_index()

    partials = docs.select(text_col).mapInPandas(
        stats_batches, schema="term string, df long, cf long"
    )
    return partials.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )


def forward_index(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text", **tok_kwargs
) -> DataFrame:
    """(doc_id, terms: array<struct<term,tf>>, dl) — the term-vector
    equivalent (MoreLikeThis.java:1113-1179), built once as a
    materialized view; no re-analysis fallback needed (SURVEY.md §4).
    """
    ct = counted_terms(docs, doc_col=doc_col, text_col=text_col, **tok_kwargs)
    return (
        ct.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "tf"))).alias("terms"),
            F.sum("tf").alias("dl"),
        )
    )
