"""Query registry: every implemented operator exposed as a
(spark_query, oracle_sql) pair over the driver-provided tables.

The driver runs each Spark query AND its DuckDB oracle side-by-side
at sf=0.01 and compares row-count + schema + order-insensitive
value-hash (CORRECTNESS_r{N}.json). Column names and float rounding
must match exactly on both sides — every computed column is aliased
identically, scores are round(x, 5) in both engines, and the
tokenizer grammar ([a-z0-9]+ over lower()) is mirrored in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index.builder import InvertedIndex, build_index
from .query.compiler import execute_query
from .query.feedback import unsupervised_feedback
from .query.mlt import MLTParams, interesting_terms
from .query.scorer import search_terms

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) — the oracle-side tokenizer and
# BM25 statistics over the `documents` view, identical semantics to
# analysis/tokenizer.py + index/builder.py
# ---------------------------------------------------------------------------

TOK_SQL = """
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE len(term) >= 1 GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
dfreq AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
)
"""

BM25_PARTIAL_SQL = """
partials AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS partial
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    if sf_dir not in _INDEX_CACHE:
        _INDEX_CACHE[sf_dir] = build_index(_docs(spark, sf_dir)).persist()
    return _INDEX_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# queries — each returns (callable, oracle_sql | None)
# ---------------------------------------------------------------------------

def q_term_stats(spark, sf_dir):
    """Term dictionary: df/cf per term (ir.docFreq / totalTermFreq)."""
    return _index(spark, sf_dir).terms.select("term", "df", "cf")


SQL_TERM_STATS = f"WITH {TOK_SQL} SELECT term, df, cf FROM dfreq"


def q_doclen(spark, sf_dir):
    """Doc lengths — the exact-norms table (DiceDefaultSimilarity)."""
    return _index(spark, sf_dir).doclen.select("doc_id", "dl")


SQL_DOCLEN = f"WITH {TOK_SQL} SELECT doc_id, dl FROM dl"


def q_bm25_single(spark, sf_dir):
    """Single-term BM25 top-10 (rare planted term 'dup')."""
    return search_terms(_index(spark, sf_dir), [("dup", 1.0)], k=10)


def _sql_topk_for_terms(
    terms_boosts, k=10, min_should_match=1, extra_where="", offset=0
):
    sel = " UNION ALL ".join(
        f"SELECT '{t}' AS term, {b}::DOUBLE AS boost" for t, b in terms_boosts
    )
    return f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL}, qt AS ({sel}),
scored AS (
  SELECT p.doc_id, round(sum(qt.boost * p.partial), 5) AS score,
         count(*) AS matched
  FROM partials p JOIN qt USING (term)
  GROUP BY p.doc_id
)
SELECT doc_id, score FROM scored WHERE matched >= {min_should_match}{extra_where}
ORDER BY score DESC, doc_id ASC LIMIT {k} OFFSET {offset}
"""


SQL_BM25_SINGLE = _sql_topk_for_terms([("dup", 1.0)], k=10)


def q_bm25_or_boosted(spark, sf_dir):
    """Boosted SHOULD union — the term-expansion scoring primitive."""
    return search_terms(
        _index(spark, sf_dir),
        [("dup", 2.0), ("batch", 1.0), ("window", 0.5)],
        k=10,
    )


SQL_BM25_OR_BOOSTED = _sql_topk_for_terms(
    [("dup", 2.0), ("batch", 1.0), ("window", 0.5)], k=10
)


def q_bm25_mm2(spark, sf_dir):
    """minShouldMatch=2 over three terms (MLTQuery mm semantics)."""
    return search_terms(
        _index(spark, sf_dir),
        [("dup", 1.0), ("hash", 1.0), ("vector", 1.0)],
        k=10,
        min_should_match=2,
    )


SQL_BM25_MM2 = _sql_topk_for_terms(
    [("dup", 1.0), ("hash", 1.0), ("vector", 1.0)], k=10, min_should_match=2
)


def q_boolean_and(spark, sf_dir):
    """Parsed boolean query: 'dup and batch' (MUST intersection)."""
    return execute_query(_index(spark, sf_dir), "dup and batch", k=10)


SQL_BOOLEAN_AND = f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL},
l AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'dup'),
r AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'batch')
SELECT l.doc_id, round(l.s + r.s, 5) AS score
FROM l JOIN r USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_boolean_not(spark, sf_dir):
    """'dup and not batch' (MUST_NOT subtraction)."""
    return execute_query(_index(spark, sf_dir), "dup and not batch", k=10)


SQL_BOOLEAN_NOT = f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL},
l AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'dup'),
r AS (SELECT doc_id FROM partials WHERE term = 'batch')
SELECT l.doc_id, round(l.s, 5) AS score
FROM l ANTI JOIN r USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_boolean_precedence(spark, sf_dir):
    """'dup and hash or vector' — NOT>AND>OR precedence parse."""
    return execute_query(_index(spark, sf_dir), "dup and hash or vector", k=10)


SQL_BOOLEAN_PRECEDENCE = f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL},
a AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'dup'),
b AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'hash'),
c AS (SELECT doc_id, partial AS s FROM partials WHERE term = 'vector'),
land AS (SELECT a.doc_id, a.s + b.s AS s FROM a JOIN b USING (doc_id)),
un AS (
  SELECT doc_id, s FROM land
  UNION ALL SELECT doc_id, s FROM c
)
SELECT doc_id, round(sum(s), 5) AS score FROM un GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


_MLT = MLTParams(min_term_freq=1, min_doc_freq=5, max_query_terms=20)


def q_mlt_terms(spark, sf_dir):
    """MLT interesting terms for seed doc 0: tf/df filters + classic
    idf weighting + L2-normalized final score."""
    return interesting_terms(_index(spark, sf_dir), [0], _MLT).select(
        "term", "tf", "df", "score"
    )


SQL_MLT_TERMS = f"""
WITH {TOK_SQL},
seed AS (SELECT term, sum(tf)::BIGINT AS tf FROM tf WHERE doc_id = 0 GROUP BY term),
cand AS (
  SELECT s.term, s.tf, d.df,
         s.tf * (ln(stats.n / (d.df + 1.0)) + 1.0) AS weight
  FROM seed s JOIN dfreq d USING (term) CROSS JOIN stats
  WHERE s.tf >= 1 AND d.df >= 5
),
top AS (SELECT * FROM cand ORDER BY weight DESC, term ASC LIMIT 20),
veclen AS (SELECT sqrt(sum(weight * weight)) AS v FROM top)
SELECT term, tf, df, round(weight / veclen.v, 5) AS score
FROM top CROSS JOIN veclen
"""


def q_mlt_text(spark, sf_dir):
    """Content-stream /mlt (DiceMoreLikeThisHandler.java:184-197): the
    seed is POSTED free text, analyzed with the index tokenizer; the
    expansion query runs with NO seed exclusion (the text never
    entered the index). End-to-end: the oracle re-derives the seed
    token counts by splitting the literal with the index grammar, then
    the full queue -> boosts -> BM25 expansion ranking."""
    from .query.mlt import more_like_text

    return more_like_text(
        _index(spark, sf_dir), "Dup batch, dup window scan!", _MLT, k=10
    )


SQL_MLT_TEXT = f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL},
seed AS (
  SELECT t AS term, count(*)::BIGINT AS tf
  FROM unnest(list_filter(
    string_split_regex(lower('Dup batch, dup window scan!'), '[^a-z0-9]+'),
    x -> x <> '')) AS u(t)
  GROUP BY t
),
cand AS (
  SELECT s.term, s.tf * (ln(stats.n / (d.df + 1.0)) + 1.0) AS weight
  FROM seed s JOIN dfreq d USING (term) CROSS JOIN stats
  WHERE s.tf >= 1 AND d.df >= 5
),
top AS (SELECT * FROM cand ORDER BY weight DESC, term ASC LIMIT 20),
veclen AS (SELECT sqrt(sum(weight * weight)) AS v FROM top),
boosts AS (
  SELECT term, round(weight / veclen.v, 5) AS boost FROM top CROSS JOIN veclen
)
SELECT p.doc_id, round(sum(b.boost * p.partial), 5) AS score
FROM partials p JOIN boosts b USING (term) GROUP BY p.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_feedback(spark, sf_dir):
    """Two-phase unsupervised feedback on 'dup' — the flagship query
    (seed top-5 -> MLT expansion -> seed MUST + expansion SHOULD)."""
    return unsupervised_feedback(
        _index(spark, sf_dir), "dup", k=10, max_seed_docs=5, params=_MLT
    )


SQL_FEEDBACK = f"""
WITH {TOK_SQL}, {BM25_PARTIAL_SQL},
seed_scored AS (
  SELECT doc_id, sum(partial) AS score FROM partials WHERE term = 'dup' GROUP BY doc_id
),
seeds AS (
  SELECT doc_id FROM seed_scored ORDER BY round(score, 5) DESC, doc_id ASC LIMIT 5
),
seed_tf AS (
  SELECT term, sum(tf)::BIGINT AS tf FROM tf
  WHERE doc_id IN (SELECT doc_id FROM seeds) GROUP BY term
),
cand AS (
  SELECT s.term, s.tf * (ln(stats.n / (d.df + 1.0)) + 1.0) AS weight
  FROM seed_tf s JOIN dfreq d USING (term) CROSS JOIN stats
  WHERE s.tf >= 1 AND d.df >= 5
),
top AS (SELECT * FROM cand ORDER BY weight DESC, term ASC LIMIT 20),
veclen AS (SELECT sqrt(sum(weight * weight)) AS v FROM top),
boosts AS (
  SELECT term, round(weight / veclen.v, 5) AS boost FROM top CROSS JOIN veclen
),
exp AS (
  SELECT p.doc_id, sum(b.boost * p.partial) AS exp_score
  FROM partials p JOIN boosts b USING (term) GROUP BY p.doc_id
)
SELECT s.doc_id, round(s.score + coalesce(e.exp_score, 0.0), 5) AS score
FROM seed_scored s LEFT JOIN exp e USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_facet_counts(spark, sf_dir):
    """Facet counts over a DocSet: lang counts for docs matching
    'dup' (JointCounts-style facet over filtered docs)."""
    idx = _index(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    match = idx.postings.filter(F.col("term") == "dup").select("doc_id")
    return (
        docs.join(match, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_FACET_COUNTS = f"""
WITH {TOK_SQL},
match AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup')
SELECT d.lang, count(*)::BIGINT AS cnt
FROM documents d SEMI JOIN match USING (doc_id)
GROUP BY d.lang
"""


def q_joint_counts(spark, sf_dir):
    """Joint (pivot) counts lang x source, mincount pruned
    (JointCounts.doPivots semantics)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


SQL_JOINT_COUNTS = """
SELECT lang, source, count(*)::BIGINT AS cnt
FROM documents GROUP BY lang, source HAVING count(*) >= 5
"""


# Driver-window ordering. The driver evaluates the FIRST 50 registered
# gates each round; dict insertion order is the contract. Gates past
# position 50 keep their oracles and pytest parity (test_oracle_parity
# runs ALL of them at sf0.01) but get no driver row this round.
#
# Rotation policy (VERDICT r02 item #1): gates green in BOTH of the
# last two driver runs may rotate past the window to make room for
# never-driver-checked gates. Rotated out for r03 (all 2x green,
# all trivial column-expression or hash-agg shapes): fq_termfreq,
# fq_fieldlen, fq_fieldval, fq_termintersect, fq_termoverlap,
# token_counts, fingerprint, quality, lang_id, pivot_rollup,
# dedup_exact, joint_counts. Rotated IN: the ten packed-path gates
# (wand_*, classic_coord, boosted_fn, range_query, mlt_docs) that were
# registered past the cap in r02, plus the new wand_field / wand_range
# packed-path routing gates.
#
# r04 rotation: IN — wand_mlt + wand_feedback (new packed-serving
# handlers, VERDICT r03 item #1) and quality_gate + dedup_apply (the
# only two gates never driver-checked, VERDICT r03 item #2). OUT —
# sessionize, context_window, sample, sample_stratified (3x driver
# green r01-r03, all simple window/hash-predicate shapes; still
# oracle-paired + pytest-parity-checked every round).
#
# r05 rotation (VERDICT r04 item #2): IN — chunk_docs, epoch_shard,
# ann_ivf, classic_lossy_norm (registered past the window in r04, all
# oracle-paired + sf0.01 pytest-parity green, never driver-checked),
# plus wand_delete (NEW r05: packed-index deletions, VERDICT r04 item
# #4). OUT — pii_redact, pack_sequences, repetition, contamination,
# joint_probability (3x driver green r02-r04, all pure
# column-expression / hash-agg / n-gram-semi-join shapes; still
# oracle-paired + pytest-parity-checked every round).
#
# r05 late rotation (same round, after the new operators landed and
# cleared sf0.01 parity): IN — the ten gates built this round
# (wand_update, wand_boosted_fn, dup_spans, dedup_substring,
# explain_score, lm_quality, ppl_buckets, mixture_sample,
# session_transcripts, tfidf_vectors) so they get driver rows in the
# round they were written instead of waiting for r06. OUT — ten gates
# driver-green in BOTH r03 and r04 whose operator shape stays covered
# by an in-window twin: phrase_query / field_query / range_query /
# boosted_fn (packed twins wand_phrase / wand_field / wand_range /
# wand_boosted_fn remain), classic_coord (classic family covered by
# classic_lossy_norm), suggest_case_variant / suggest_canonical /
# spellcheck_collate (spellcheck remains), nb_classify / stumps
# (analytics covered by event_windows + the new lm/ppl gates). All
# ten stay oracle-paired + pytest-parity-checked every round.
#
# r05 addition: cursor_page (searchAfter/cursorMark deep paging over
# the packed index, first-timer) rotated IN; bm25_or_boosted (4x
# driver-green r01-r04) rotated OUT — its boosted-OR oracle shape
# stays in-window twice over (wand_or shares the identical SQL, and
# cursor_page scores the same boosted-OR query).
#
# r05 addition: collapse_field + wand_collapse (Solr
# CollapsingQParserPlugin field collapse, flat + packed, first-timers)
# rotated IN; boolean_and + boolean_not (4x driver-green r01-r04)
# rotated OUT — their MUST/MUST_NOT shapes stay in-window via the
# packed twins wand_boolean / wand_not, and boolean_precedence keeps
# the flat parser path certified.
#
# r05 addition: rerank + wand_rerank (Solr ReRankQParserPlugin
# two-pass re-ranking, flat + packed, first-timers) rotated IN;
# mlt_terms + feedback (4x driver-green r01-r04) rotated OUT — the
# interesting-terms queue is the SAME shared helper the in-window
# wand_mlt executes, and feedback's oracle (SQL_FEEDBACK) is the
# identical SQL the in-window wand_feedback is checked against.
#
# r05 addition: facet_range + wand_facet_range (Solr facet.range) and
# field_stats + wand_stats (Solr StatsComponent), flat + packed,
# first-timers, rotated IN; rotated OUT (all 4x driver-green
# r01-r04): bm25_single (identical oracle in-window via wand_single),
# mlt_docs (identical oracle via wand_mlt), term_stats + doclen
# (their df/cf and dl values are recomputed from scratch inside every
# in-window BM25 oracle's CTEs — a regression in either breaks those
# gates immediately).
#
# r05 addition: highlight (Solr highlighter best-window snippets,
# first-timer) rotated IN; boolean_precedence (4x driver-green
# r01-r04) rotated OUT — its oracle (SQL_BOOLEAN_PRECEDENCE) is the
# identical SQL the in-window wand_boolean is checked against, and
# the parser keeps its 23 ported golden tests.
#
# r05 addition: elevation + wand_elevation (Solr
# QueryElevationComponent, flat + packed, first-timers) rotated IN;
# rotated OUT: wand_or (2x green r03-r04 — the in-window cursor_page
# runs the IDENTICAL boosted-OR wand_search query and checks its
# ranking one page deeper) and ann_lsh (3x green r02-r04 — the
# hyperplane-LSH bucketing stays exercised in-window by emb_near_dup,
# and ann_ivf holds the bucketed-ANN serving shape).
#
# r05 addition: grouping + wand_grouping (Solr result grouping
# group.limit=n, flat + packed, first-timers) rotated IN; rotated
# OUT: simhash + ngram_jaccard (3x driver-green r02-r04 — the
# near-dup family keeps six in-window gates: dedup_minhash_sig,
# dedup_clusters, dedup_apply, dup_spans/dedup_substring/dedup_lines,
# plus emb_near_dup for the LSH-bucket shape).
#
# r05 addition: join_query + wand_join (Solr JoinQParser cross-core
# join, flat + packed-key-set) and dismax (DisMaxQParser multi-field
# disjunction-max), first-timers, rotated IN; rotated OUT:
# dedup_minhash_sig (3x green r02-r04 — the minhash-LSH pair stream
# is the input the in-window dedup_clusters/dedup_apply gates consume
# every round), knn_join (3x green — the bucket-equi-join ANN shape
# stays in-window via emb_near_dup and ann_ivf), event_windows (2x+
# green — the sessionize lag+cumsum rule stays in-window via
# session_transcripts, and the streamed==batch watermark semantics
# are pinned by tests/test_events_windows + test_streaming_payloads).
#
# r05 addition: terms_enum (Solr TermsComponent /terms enumeration,
# first-timer) rotated IN; wand_single (2x green r03-r04) rotated OUT
# — the wand_search entry point and kernel are exercised in-window by
# cursor_page (the SAME code path, boosted multi-term, checked one
# page deeper) and by every other wand_* gate, and the single-term
# BM25 oracle stays held by the parity suite's bm25_single/wand_single
# rows at sf0.01 every round.
#
# r06 rotation: IN — the four gates built this round: wand_terms_enum
# / wand_spellcheck / wand_suggest (packed-tier dictionary surfaces
# over the termstats sidecar, VERDICT r05 item #1) and mlt_text
# (content-stream /mlt, VERDICT r05 item #5). All 35 r05 first-timers
# STAY in-window for their second green row (VERDICT r05 item #2).
# OUT (each >=2x driver-green, shape still covered in-window):
# spellcheck (5x green r01-r05 — the packed twin wand_spellcheck runs
# the IDENTICAL spellcheck_suggest code against the same oracle, only
# the dictionary source differs), wand_mlt (2x green r04-r05 — the
# packed seed/sidecar machinery stays in-window via wand_feedback,
# and the shared MLT queue via mlt_text), emb_near_dup (4x green
# r02-r05 — the LSH-bucketed ANN shape stays in-window via ann_ivf)
# and dedup_clusters (4x green r02-r05 — the in-window dedup_apply
# gate consumes clusters' output every round, so a clustering
# regression still breaks an in-window gate).
#
# r06 addition: facet_query + wand_facet_query (Solr facet.query),
# stats_facet + wand_stats_facet (Solr stats.facet per-bucket stats)
# and phrase_slop + wand_phrase_slop (`"a b"~n` ordered span-near),
# flat + packed first-timers, rotated IN. OUT (each >=2x driver-green,
# kernel shape still certified in-window): wand_boolean + wand_not +
# wand_range (3x green r03-r05 — wand_facet_query evaluates AND / NOT
# / docvalues-range subtrees in the SAME packed kernel every round),
# wand_facet (3x green r03-r05 — the ordinal-docvalues machinery runs
# in-window via wand_stats_facet), wand_phrase (3x green r03-r05 —
# the positional sub-stream + phrase kernel run in-window via
# wand_phrase_slop, whose slop=0 equivalence to the exact path is
# pytest-pinned), bm25_mm2 (5x green r01-r05 — the minShouldMatch
# filter stays pinned by tests/test_scoring + sf0.01 oracle parity
# every pytest run).
_WINDOW_ORDER = [
    # packed-path gates — never driver-checked before r03
    "cursor_page",
    "wand_payload",
    "wand_field",
    "collapse_field",
    "wand_collapse",
    "rerank",
    "wand_rerank",
    "facet_range",
    "wand_facet_range",
    "field_stats",
    "wand_stats",
    "highlight",
    "elevation",
    "wand_elevation",
    "grouping",
    "wand_grouping",
    "join_query",
    "wand_join",
    "dismax",
    "terms_enum",
    # r06: packed-tier dictionary surfaces + content-stream /mlt
    "wand_terms_enum",
    "wand_spellcheck",
    "wand_suggest",
    "mlt_text",
    # r06: facet.query / stats.facet / sloppy-phrase serving
    # components (flat + packed first-timers)
    "facet_query",
    "wand_facet_query",
    "stats_facet",
    "wand_stats_facet",
    "phrase_slop",
    "wand_phrase_slop",
    "wand_feedback",
    "wand_delete",
    "wand_update",
    "wand_boosted_fn",
    # flat-path extensions
    "explain_score",
    # analytics
    "session_transcripts",
    "tfidf_vectors",
    # LLM-pipeline operators
    "lm_quality",
    "ppl_buckets",
    "mixture_sample",
    "source_cap",
    "dup_spans",
    "dedup_substring",
    "dedup_lines",
    "dedup_apply",
    "quality_gate",
    "chunk_docs",
    "epoch_shard",
    "ann_ivf",
    "classic_lossy_norm",
    # --- driver window boundary (position 50) ---
    # r06 rotation: spellcheck / wand_mlt / emb_near_dup /
    # dedup_clusters (all >=2x driver-green; see policy comment above)
    # made room for wand_terms_enum / wand_spellcheck / wand_suggest /
    # mlt_text; wand_boolean / wand_not / wand_range / wand_facet /
    # wand_phrase / bm25_mm2 (kernel shapes certified in-window by the
    # new gates, see policy comment) made room for facet_query /
    # wand_facet_query / stats_facet / wand_stats_facet / phrase_slop
    # / wand_phrase_slop
    "spellcheck",
    "wand_mlt",
    "emb_near_dup",
    "dedup_clusters",
    "bm25_mm2",
    "wand_boolean",
    "wand_not",
    "wand_range",
    "wand_facet",
    "wand_phrase",
    # rotated out (>=2x driver-green; still oracle+pytest covered)
    # r05 late rotation: flat twins of in-window packed gates + 3x-
    # green suggest/analytics shapes (see policy comment above);
    # payload_search (flat twin of in-window wand_payload) made room
    # for the new source_cap gate; facet_counts (flat twin of
    # in-window wand_facet) made room for the new dedup_lines gate;
    # bm25_or_boosted (oracle shared with in-window wand_or) made room
    # for the new cursor_page gate; boolean_and / boolean_not (packed
    # twins wand_boolean / wand_not in-window) made room for the new
    # collapse_field / wand_collapse gates
    # mlt_terms / feedback (shared queue helper + identical oracle as
    # in-window wand_mlt / wand_feedback) made room for the new
    # rerank / wand_rerank gates; bm25_single / mlt_docs / term_stats
    # / doclen (oracles shared with, or recomputed inside, in-window
    # gates) made room for facet_range / wand_facet_range /
    # field_stats / wand_stats
    # boolean_precedence (oracle shared with in-window wand_boolean)
    # made room for the new highlight gate; wand_or (cursor_page runs
    # the identical query one page deeper) + ann_lsh (LSH machinery
    # in-window via emb_near_dup/ann_ivf) made room for elevation /
    # wand_elevation
    "wand_or",
    "ann_lsh",
    "boolean_precedence",
    # simhash / ngram_jaccard (3x green; dedup family keeps six
    # in-window gates) made room for grouping / wand_grouping;
    # dedup_minhash_sig / knn_join / event_windows (see policy
    # comment) made room for join_query / wand_join / dismax
    "simhash",
    "ngram_jaccard",
    "dedup_minhash_sig",
    "knn_join",
    "event_windows",
    # wand_single (kernel held in-window by cursor_page + the wand
    # family) made room for terms_enum
    "wand_single",
    "term_stats",
    "doclen",
    "bm25_single",
    "mlt_docs",
    "bm25_or_boosted",
    "boolean_and",
    "boolean_not",
    "mlt_terms",
    "feedback",
    "payload_search",
    "facet_counts",
    "phrase_query",
    "field_query",
    "range_query",
    "boosted_fn",
    "classic_coord",
    "suggest_case_variant",
    "suggest_canonical",
    "spellcheck_collate",
    "nb_classify",
    "stumps",
    # r05: joint_probability (3x green r02-r04, smoothing-agg shape)
    # rotated out for the new wand_delete liveDocs gate
    "joint_probability",
    "pii_redact",
    "pack_sequences",
    "repetition",
    "contamination",
    "sessionize",
    "context_window",
    "sample",
    "sample_stratified",
    "ann_cosine",
    "joint_counts",
    "pivot_rollup",
    "dedup_exact",
    "fq_termfreq",
    "fq_fieldlen",
    "fq_fieldval",
    "fq_termintersect",
    "fq_termoverlap",
    "token_counts",
    "fingerprint",
    "quality",
    "lang_id",
    # r06: registered past the window (rotation candidates for r07) —
    # BPE tokenizer-training pair statistics (text/bpe.py), DSIR
    # importance-resampling weights (text/dsir.py), and the composed
    # CCNet pipeline (text/ccnet.py)
    "bpe_pairs",
    "dsir_weights",
    "ccnet_pipeline",
    # r06: Solr stats.percentiles served exactly (histogram +
    # k-th-smallest), flat + packed — r07 rotation candidates
    "stats_percentiles",
    "wand_stats_percentiles",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from .registry_ext import EXT_QUERIES

    pool = {
        "term_stats": q_term_stats,
        "doclen": q_doclen,
        "bm25_single": q_bm25_single,
        "bm25_or_boosted": q_bm25_or_boosted,
        "bm25_mm2": q_bm25_mm2,
        "boolean_and": q_boolean_and,
        "boolean_not": q_boolean_not,
        "boolean_precedence": q_boolean_precedence,
        "mlt_terms": q_mlt_terms,
        "mlt_text": q_mlt_text,
        "feedback": q_feedback,
        "facet_counts": q_facet_counts,
        "joint_counts": q_joint_counts,
    }
    pool.update(EXT_QUERIES)
    ordered = {name: pool[name] for name in _WINDOW_ORDER if name in pool}
    # safety: anything registered but missing from the order list goes last
    for name, fn in pool.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    from .registry_ext import ext_oracle_sql

    base = {
        "term_stats": SQL_TERM_STATS,
        "doclen": SQL_DOCLEN,
        "bm25_single": SQL_BM25_SINGLE,
        "bm25_or_boosted": SQL_BM25_OR_BOOSTED,
        "bm25_mm2": SQL_BM25_MM2,
        "boolean_and": SQL_BOOLEAN_AND,
        "boolean_not": SQL_BOOLEAN_NOT,
        "boolean_precedence": SQL_BOOLEAN_PRECEDENCE,
        "mlt_terms": SQL_MLT_TERMS,
        "mlt_text": SQL_MLT_TEXT,
        "feedback": SQL_FEEDBACK,
        "facet_counts": SQL_FACET_COUNTS,
        "joint_counts": SQL_JOINT_COUNTS,
    }
    base.update(ext_oracle_sql())
    return base
