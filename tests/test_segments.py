"""Segment build + pruned query tests (SURVEY.md §5.3/§5.5):
- packed search is rank-identical to the exhaustive flat scorer
- resumability: kill after group i, resume, byte-identical index
- manifest carries lineage + throughput metrics."""

import glob
import hashlib
import json
import os

import pandas as pd
import pytest

from solrplugins_spark.index.segments import (
    SegmentIndex,
    build_segments,
    wand_search,
)
from solrplugins_spark.query.scorer import search_terms


@pytest.fixture(scope="module")
def seg_index(tiny_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("segs") / "idx")
    return build_segments(tiny_index, out, seg_size=64, groups=3)


QUERIES = [
    [("w0001", 1.0)],
    [("zephyrblade", 1.0)],
    [("w0000", 2.0), ("w0005", 1.0), ("zephyrblade", 4.0)],
    [("w0001", 1.0), ("w0002", 1.0), ("w0003", 1.0), ("w0010", 0.5)],
    [("nosuchterm", 1.0)],
]


@pytest.mark.parametrize("terms", QUERIES)
def test_wand_rank_identical_to_flat(spark, tiny_index, seg_index, terms):
    got = wand_search(spark, seg_index, terms, k=10).toPandas()
    want = search_terms(tiny_index, terms, k=10).toPandas()
    pd.testing.assert_frame_equal(got, want)


def test_wand_k_larger_than_matches(spark, tiny_index, seg_index):
    got = wand_search(spark, seg_index, [("zephyrblade", 1.0)], k=10_000).toPandas()
    want = search_terms(tiny_index, [("zephyrblade", 1.0)], k=10_000).toPandas()
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("mm", [2, 3])
def test_wand_min_should_match_rank_identical_to_flat(
    spark, tiny_index, seg_index, mm
):
    """mm>1 on the packed path (VERDICT r04 item #5): the exact
    per-segment scorer counts matched clauses and filters before
    top-k, rank-identical to flat search_terms(min_should_match=mm)
    — the SQL_BM25_MM oracle shape (HAVING count(*) >= mm)."""
    terms = [("w0000", 2.0), ("w0005", 1.0), ("zephyrblade", 4.0)]
    got = wand_search(spark, seg_index, terms, k=10, min_should_match=mm).toPandas()
    want = search_terms(tiny_index, terms, k=10, min_should_match=mm).toPandas()
    pd.testing.assert_frame_equal(got, want)
    # the mm filter must actually bite: mm=1 returns strictly more docs
    loose = wand_search(spark, seg_index, terms, k=1000).toPandas()
    assert len(loose) > len(got)


def test_packed_mlt_min_should_match(spark, tiny_corpus_pd, tiny_index, tmp_path):
    """packed /mlt with mm=2 (previously raised): equal to the flat
    mlt path under the same params."""
    from solrplugins_spark.query.handlers import packed_mlt_handler
    from solrplugins_spark.query.mlt import MLTParams, more_like_this

    out = str(tmp_path / "mlt_mm")
    seg = build_segments(
        tiny_index, out, seg_size=64, groups=2, store_cols=["text"]
    )
    params = MLTParams(min_doc_freq=2, max_query_terms=20, min_should_match=2)
    got = packed_mlt_handler(spark, seg, [7], params, k=10)["docs"].toPandas()
    want = more_like_this(tiny_index, [7], params, k=10).toPandas()
    pd.testing.assert_frame_equal(got, want)


def _dir_hash(path: str) -> dict[str, str]:
    out = {}
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        # hash parquet CONTENT via pandas (file bytes embed write times)
        df = pd.read_parquet(f)
        key = os.path.relpath(f, path).rsplit("part-", 1)[0]
        for c in df.columns:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
        h = hashlib.sha256(
            pd.util.hash_pandas_object(
                df.sort_values(list(df.columns)).reset_index(drop=True)
            ).values.tobytes()
        ).hexdigest()
        out[key] = h
    return out


def test_resume_is_identical(tiny_index, tmp_path):
    full = str(tmp_path / "full")
    build_segments(tiny_index, full, seg_size=64, groups=3)

    part = str(tmp_path / "part")
    # simulate a kill: build, then strip the last 2 groups from the manifest
    build_segments(tiny_index, part, seg_size=64, groups=3)
    mp = os.path.join(part, "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["completed_groups"] = m["completed_groups"][:1]
    m["lineage"] = m["lineage"][:1]
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="incomplete"):
        SegmentIndex.load(part)
    # resume with a DIFFERENT groups argument: the manifest's n_groups
    # must win, or completed-group bookkeeping would skip segments
    # (code-review r03 regression)
    resumed = build_segments(tiny_index, part, seg_size=64, groups=2, resume=True)
    assert _dir_hash(os.path.join(full, "postings")) == _dir_hash(
        os.path.join(part, "postings")
    )
    assert _dir_hash(os.path.join(full, "doclens")) == _dir_hash(
        os.path.join(part, "doclens")
    )
    loaded = SegmentIndex.load(part)
    assert loaded.n_docs == resumed.n_docs


def test_manifest_lineage_and_metrics(seg_index):
    with open(os.path.join(seg_index.path, "manifest.json")) as f:
        m = json.load(f)
    assert m["codec_version"] == 3
    assert sorted(m["completed_groups"]) == list(range(m["n_groups"]))
    for entry in m["lineage"]:
        assert entry["docs_per_sec"] is None or entry["docs_per_sec"] > 0
        assert "segments" in entry and "seconds" in entry


def test_wand_search_multi_matches_single(spark, tiny_corpus_pd, tiny_index, seg_index, tmp_path):
    """Querying two packed indexes (disjoint doc halves) with global
    stats equals querying one index over the full corpus."""
    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import wand_search_multi

    half_a = spark.createDataFrame(tiny_corpus_pd[tiny_corpus_pd["doc_id"] < 200])
    half_b = spark.createDataFrame(tiny_corpus_pd[tiny_corpus_pd["doc_id"] >= 200])
    seg_a = build_segments(build_index(half_a), str(tmp_path / "a"), seg_size=64, groups=2)
    seg_b = build_segments(build_index(half_b), str(tmp_path / "b"), seg_size=64, groups=2)

    for terms in ([("zephyrblade", 1.0)], [("w0000", 2.0), ("w0005", 1.0)]):
        multi = wand_search_multi(spark, [seg_a, seg_b], terms, k=10).toPandas()
        single = wand_search(spark, seg_index, terms, k=10).toPandas()
        pd.testing.assert_frame_equal(multi, single)


def test_impact_ordered_pruning_skewed_tf():
    """Skewed-tf head-OR fixture (VERDICT r02 #5): with a long tf=1
    tail and a few high-tf docs, the impact-ordered scorer must (a)
    rank identically to a brute-force full decode and (b) decode only
    a small fraction of blocks — the PostingsEnum.advance-style skip
    benefit, asserted deterministically via decode counts rather than
    wall-clock."""
    import numpy as np

    from solrplugins_spark.index.codec import encode_postings
    from solrplugins_spark.index.segments import _segment_topk_core, _topk_frame

    rng = np.random.default_rng(7)
    n_docs = 60_000
    dls = rng.integers(20, 60, size=n_docs).astype(np.int64)

    def make_term(df, hot, hot_tf):
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = np.ones(df, dtype=np.int64)
        hot_idx = rng.choice(df, size=hot, replace=False)
        tfs[hot_idx] = rng.integers(hot_tf // 2, hot_tf, size=hot)
        return docs, tfs

    term_rows = []
    truth_docs = np.arange(n_docs, dtype=np.int64)
    truth_scores = np.zeros(n_docs)
    boosts, idfs = {}, {}
    k1, b, avgdl = 1.2, 0.75, float(dls.mean())
    for name, df, hot, hot_tf, boost in [
        ("head1", 30_000, 40, 30, 1.0),
        ("head2", 25_000, 40, 25, 1.0),
        ("mid", 4_000, 20, 40, 2.0),
    ]:
        docs, tfs = make_term(df, hot, hot_tf)
        data, bl, bm, bo = encode_postings(docs, tfs)
        term_rows.append({
            "term": name, "data": data, "df": df,
            "block_last": bl, "block_max": bm, "block_off": bo,
        })
        n = float(n_docs)
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        boosts[name], idfs[name] = boost, idf
        tfd = tfs.astype(np.float64)
        truth_scores[docs] += (
            boost * idf * tfd * (k1 + 1.0)
            / (tfd + k1 * (1.0 - b + b * dls[docs] / avgdl))
        )

    acc_docs, acc_scores, stats = _segment_topk_core(
        term_rows, dls, 0, boosts, idfs, k=10, k1=k1, b=b, avgdl=avgdl
    )
    got = _topk_frame(acc_docs, acc_scores, 10)
    hit = truth_scores > 0
    want = _topk_frame(truth_docs[hit], truth_scores[hit], 10)
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-12)

    frac = stats["blocks_decoded"] / stats["blocks_total"]
    assert frac < 0.25, f"pruning ineffective: decoded {frac:.0%} of blocks"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(50, 4000),
    n_terms=st.integers(1, 5),
    k=st.integers(1, 20),
)
def test_impact_ordered_core_rank_identical_property(seed, n_docs, n_terms, k):
    """Property: for random postings (random dfs, tf skew, doclens,
    boosts), the impact-ordered pruned scorer returns exactly the
    brute-force top-k — same docs, same scores, same tie-breaks."""
    import numpy as np

    from solrplugins_spark.index.codec import encode_postings
    from solrplugins_spark.index.segments import _segment_topk_core, _topk_frame

    rng = np.random.default_rng(seed)
    dls = rng.integers(1, 80, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    k1, b = 1.2, 0.75
    term_rows, boosts, idfs = [], {}, {}
    truth = np.zeros(n_docs)
    for ti in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        # heavy tf skew: mostly 1s, a few spikes
        tfs = np.where(
            rng.random(df) < 0.05, rng.integers(2, 60, size=df), 1
        ).astype(np.int64)
        data, bl, bm, bo = encode_postings(docs, tfs)
        name = f"t{ti}"
        term_rows.append({
            "term": name, "data": data, "df": df,
            "block_last": bl, "block_max": bm, "block_off": bo,
        })
        boosts[name] = float(rng.choice([0.5, 1.0, 2.0, 3.0]))
        idfs[name] = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
        tfd = tfs.astype(np.float64)
        truth[docs] += (
            boosts[name] * idfs[name] * tfd * (k1 + 1.0)
            / (tfd + k1 * (1.0 - b + b * dls[docs] / avgdl))
        )

    acc_d, acc_s, _ = _segment_topk_core(
        term_rows, dls, 0, boosts, idfs, k=k, k1=k1, b=b, avgdl=avgdl
    )
    got = _topk_frame(acc_d, acc_s, k)
    hit = truth > 0
    want = _topk_frame(
        np.arange(n_docs, dtype=np.int64)[hit], truth[hit], k
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )
