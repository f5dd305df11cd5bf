"""Packed-tier term dictionary (index.dictionary): serve-tier
spellcheck / suggest / /terms over the termstats sidecar.

The 100-TB serve tier holds only the packed index — no flat
``InvertedIndex.terms`` frame exists there. These tests pin that the
sidecar-backed surfaces are OUTPUT-IDENTICAL to the flat ones
(DiceDirectSolrSpellChecker.java:80-98 / DiceSuggester.java:141-145 /
TermsComponent semantics), that multi-generation dictionaries sum
df/cf like the query-time idf contract, and that the prefix predicate
really prunes the sidecar scan (row-group-level, via scan metrics).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.index.builder import build_index
from solrplugins_spark.index.dictionary import (
    packed_dictionary,
    sidecar_terms,
    wand_canonical_suggest,
    wand_spellcheck_suggest,
    wand_terms_enum,
)
from solrplugins_spark.index.segments import build_segments
from solrplugins_spark.query.components import terms_enum
from solrplugins_spark.suggest import (
    canonical_suggest,
    high_frequency_dictionary,
    spellcheck_suggest,
)


@pytest.fixture(scope="module")
def dict_segments(tiny_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dictidx"))
    return build_segments(tiny_index, out + "/idx", seg_size=128, groups=2)


def _sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_sidecar_carries_cf_and_matches_flat_terms(
    spark, tiny_index, dict_segments
):
    got = _sorted(sidecar_terms(spark, dict_segments))
    want = _sorted(tiny_index.terms.select("term", "df", "cf"))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("sort", ["count", "index"])
def test_packed_terms_enum_matches_flat(spark, tiny_index, dict_segments, sort):
    flat = terms_enum(
        tiny_index, prefix="w01", limit=10, sort=sort, min_count=2
    ).toPandas()
    packed = wand_terms_enum(
        spark, dict_segments, prefix="w01", limit=10, sort=sort, min_count=2
    ).toPandas()
    assert len(flat) > 0
    pd.testing.assert_frame_equal(flat, packed)


def test_packed_spellcheck_matches_flat(spark, tiny_index, dict_segments):
    # tiny-corpus vocabulary is synthetic wNNNN token soup: w00o0 is
    # one substitution from w0000, w0x07 two edits from w0007
    toks = ["w00o0", "w0x07", "w0000"]
    typos = {"w00o0": "w0001"}
    flat = _sorted(spellcheck_suggest(tiny_index, toks, typos=typos))
    packed = _sorted(
        wand_spellcheck_suggest(spark, dict_segments, toks, typos=typos)
    )
    assert len(flat) > 0
    pd.testing.assert_frame_equal(flat, packed)


def test_packed_canonical_suggest_matches_flat(spark, tiny_index, dict_segments):
    flat = canonical_suggest(
        high_frequency_dictionary(tiny_index, threshold=0.05), "w00", count=10
    ).toPandas()
    packed = wand_canonical_suggest(
        spark, dict_segments, "w00", threshold=0.05, count=10
    ).toPandas()
    assert len(flat) > 0
    pd.testing.assert_frame_equal(flat, packed)


def test_multi_generation_dictionary_sums_stats(
    spark, tiny_corpus, tiny_index, tmp_path
):
    """Two generations over disjoint doc halves: the merged dictionary
    must equal the whole-corpus flat dictionary (df/cf additive over
    disjoint doc sets), and the packed surfaces must serve the merged
    stats — the contract that lets spellcheck run against a streamed,
    not-yet-compacted index."""
    half_a = tiny_corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = tiny_corpus.filter(F.col("doc_id") % 2 == 1)
    seg_a = build_segments(
        build_index(half_a), str(tmp_path / "a"), seg_size=128, groups=1
    )
    seg_b = build_segments(
        build_index(half_b), str(tmp_path / "b"), seg_size=128, groups=1
    )
    merged = _sorted(sidecar_terms(spark, [seg_a, seg_b]))
    whole = _sorted(tiny_index.terms.select("term", "df", "cf"))
    pd.testing.assert_frame_equal(merged, whole)

    d = packed_dictionary(spark, [seg_a, seg_b])
    assert d.n_docs == tiny_index.n_docs

    flat = terms_enum(tiny_index, prefix="w01", limit=10, min_count=2).toPandas()
    packed = wand_terms_enum(
        spark, [seg_a, seg_b], prefix="w01", limit=10, min_count=2
    ).toPandas()
    assert len(flat) > 0
    pd.testing.assert_frame_equal(flat, packed)


def test_pre_cf_sidecar_reads_null_cf(spark, tiny_index, dict_segments, tmp_path):
    """Backward compat: a sidecar written before cf existed reads as
    cf=NULL — surfaces that only need df (spellcheck, suggest) are
    unaffected, terms_enum serves NULL cf instead of crashing."""
    old = str(tmp_path / "old")
    os.makedirs(old)
    spark.read.parquet(os.path.join(dict_segments.path, "termstats")).select(
        "term", "df"
    ).write.parquet(os.path.join(old, "termstats"))

    class _Shim:  # SegmentIndex-lite: dictionary only reads .path/.n_docs
        path = old
        n_docs = dict_segments.n_docs

    got = sidecar_terms(spark, _Shim()).toPandas()
    assert got["cf"].isna().all()
    toks = ["w00o0"]
    flat = _sorted(spellcheck_suggest(tiny_index, toks))
    packed = _sorted(wand_spellcheck_suggest(spark, _Shim(), toks))
    pd.testing.assert_frame_equal(flat, packed)


def _scan_metrics(df):
    plan = df._jdf.queryExecution().executedPlan()

    def _walk(node, out):
        out.append(node)
        for i in range(node.children().length()):
            _walk(node.children().apply(i), out)

    nodes = []
    _walk(plan, nodes)
    out = {}
    for n in nodes:
        if "Scan" in n.nodeName():
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
    return out, plan.toString()


def test_sidecar_prefix_prune(spark, tiny_index, dict_segments):
    """The files-read contract (VERDICT r05 item #1): the sidecar is
    range-partitioned into disjoint sorted term ranges, so a prefix
    enumeration must (a) push StringStartsWith into the parquet scan
    and (b) decode strictly fewer rows than the vocabulary — the
    row groups outside the prefix range are skipped via their
    min/max stats, which is what bounds a /terms or spellcheck
    request to O(its prefix buckets) on a 100-TB dictionary."""
    side = os.path.join(dict_segments.path, "termstats")
    files = [f for f in os.listdir(side) if f.endswith(".parquet")]
    assert len(files) >= 2, "sidecar must be range-partitioned into >1 file"
    n_vocab = tiny_index.terms.count()

    df = wand_terms_enum(spark, dict_segments, prefix="w01", limit=10, min_count=2)
    df.collect()
    metrics, plan = _scan_metrics(df)
    assert "StringStartsWith" in plan, plan
    n_scanned = metrics.get("numOutputRows")
    n_prefix = tiny_index.terms.filter(F.col("term").startswith("w01")).count()
    assert n_prefix > 0
    assert n_prefix <= n_scanned < n_vocab, (n_prefix, n_scanned, n_vocab)


def test_spellcheck_prune_covers_typo_corrections(spark, tiny_index, dict_segments):
    """A typo correction outside every token's prefix bucket must
    still be found: the prune prefix set includes the corrections'
    prefixes, or the override join would silently miss."""
    # token prefix 'x...' (no dictionary terms), correction 'w0000'
    toks = ["xqz"]
    typos = {"xqz": "w0000"}
    flat = _sorted(spellcheck_suggest(tiny_index, toks, typos=typos))
    packed = _sorted(
        wand_spellcheck_suggest(spark, dict_segments, toks, typos=typos)
    )
    assert list(flat["suggestion"]) == ["w0000"]
    pd.testing.assert_frame_equal(flat, packed)


def test_mixed_cf_generations_keep_cf_null(spark, dict_segments, tmp_path):
    """A term held by BOTH a cf-bearing and a pre-cf generation must
    serve cf=NULL ("unknown"), never the cf generations' partial sum —
    sum() alone skips NULLs and would serve an understated count
    indistinguishable from a real total."""
    full = spark.read.parquet(
        os.path.join(dict_segments.path, "termstats")
    ).toPandas().sort_values("term").reset_index(drop=True)
    half = len(full) // 2
    old = str(tmp_path / "oldgen")
    os.makedirs(os.path.join(old, "termstats"))
    spark.createDataFrame(full.iloc[:half][["term", "df"]]).write.mode(
        "overwrite"
    ).parquet(os.path.join(old, "termstats"))

    class _Shim:
        path = old
        n_docs = dict_segments.n_docs

    got = (
        sidecar_terms(spark, [dict_segments, _Shim()])
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    shared = set(full.iloc[:half]["term"])
    mask = got["term"].isin(shared)
    assert got[mask]["cf"].isna().all()
    only_new = got[~mask].set_index("term")["cf"]
    want = full.iloc[half:].set_index("term")["cf"]
    assert (only_new.sort_index() == want.sort_index()).all()
    # df still sums over every generation holding the term
    dfs = got[mask].set_index("term")["df"]
    want_df = full.iloc[:half].set_index("term")["df"] * 2
    assert (dfs.sort_index() == want_df.sort_index()).all()


def test_packed_spellcheck_min_prefix_zero_matches_flat(
    spark, tiny_index, dict_segments
):
    """min_prefix=0 (candidates may differ in their first character —
    the flat path's documented degenerate cross-join config) must stay
    output-identical on the packed tier: no prefix is a complete cover
    there, so the sidecar is read unpruned rather than silently
    dropping suggestions."""
    toks = ["w00o0"]
    flat = _sorted(spellcheck_suggest(tiny_index, toks, min_prefix=0))
    packed = _sorted(
        wand_spellcheck_suggest(spark, dict_segments, toks, min_prefix=0)
    )
    pd.testing.assert_frame_equal(flat, packed)
