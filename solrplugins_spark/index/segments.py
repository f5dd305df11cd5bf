"""Packed posting-list segments: the at-scale index representation.

Reference analogue: Lucene segment files (postings + norms) that the
plugins consume via IndexReader; suggester persistence
(DiceSuggester.java:120-136 lookup.store/load) is the same
write-once/load pattern. Here a *segment* is a contiguous docID range:

    postings/seg=<s>/  rows (term, df, cf, block_last array<long>,
                             block_max array<int>, data binary)
    doclens/seg=<s>/   one row (seg, doc_lo, n, dl_data binary)
    manifest.json      codec version, corpus stats, per-segment-group
                       lineage + throughput metrics (north rule:
                       resumable checkpoints with lineage and metrics)

Design for 10^12 turns: segments are doc-range shards, so posting
lists stay bounded (a term's postings split across segments), delta
encoding stays small (dense local ids), and query fan-out is
embarrassingly parallel per segment with a k-row-per-segment final
merge. Head-term skew never concentrates on one task because a
stop-word's postings are spread over every segment — the doc-range
sharding IS the salting for the packed layout (the flat build's
groupBy(doc_id, term) already salts naturally by doc).

Build is resumable: segment groups are built in separate Spark jobs;
each completed group appends a manifest entry; resume skips completed
groups and produces byte-identical output (tests/test_segments.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import InvertedIndex
from .codec import (
    decode_blocks,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)

CODEC_VERSION = 2

POSTINGS_SCHEMA = (
    "seg int, term string, df long, cf long, "
    "block_last array<long>, block_max array<int>, block_off array<long>, "
    "data binary"
)
DOCLEN_SCHEMA = "seg int, doc_lo long, n int, dl_data binary"


@dataclass
class SegmentIndex:
    path: str
    n_docs: int
    avgdl: float
    n_segments: int
    seg_size: int

    @classmethod
    def load(cls, path: str) -> "SegmentIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
        if m["codec_version"] != CODEC_VERSION:
            raise ValueError(f"codec version mismatch: {m['codec_version']}")
        if set(m["completed_groups"]) != set(range(m["n_groups"])):
            raise ValueError("index incomplete — resume the build first")
        return cls(
            path=path,
            n_docs=m["n_docs"],
            avgdl=m["avgdl"],
            n_segments=m["n_segments"],
            seg_size=m["seg_size"],
        )


def _manifest_path(path: str) -> str:
    return os.path.join(path, "manifest.json")


def _read_manifest(path: str) -> dict | None:
    p = _manifest_path(path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _write_manifest(path: str, m: dict) -> None:
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, _manifest_path(path))


def build_segments(
    index: InvertedIndex,
    out_path: str,
    seg_size: int = 65536,
    groups: int = 4,
    resume: bool = True,
) -> SegmentIndex:
    """Pack the flat index into compressed segments, resumably.

    Runs ``groups`` sequential Spark jobs, each building a slice of the
    segments; after each group commits (parquet written), its manifest
    entry is appended with lineage (segment range, row counts, codec
    version) and throughput. A killed build resumes from the manifest
    and yields byte-identical segments (content is a pure function of
    the flat index, which is deterministic given the corpus).
    """
    spark = index.postings.sparkSession
    n_docs = index.n_docs
    n_segments = max(1, (n_docs + seg_size - 1) // seg_size)
    groups = min(groups, n_segments)

    m = _read_manifest(out_path) if resume else None
    if m is None or m.get("codec_version") != CODEC_VERSION:
        os.makedirs(out_path, exist_ok=True)
        m = {
            "codec_version": CODEC_VERSION,
            "n_docs": n_docs,
            "avgdl": index.avgdl,
            "seg_size": seg_size,
            "n_segments": n_segments,
            "n_groups": groups,
            "completed_groups": [],
            "lineage": [],
        }
        _write_manifest(out_path, m)
    else:
        assert m["n_docs"] == n_docs and m["seg_size"] == seg_size, (
            "resume with different corpus/params — wipe the output dir"
        )

    seg_col = (F.col("doc_id") / seg_size).cast("int")
    with_seg = index.postings.withColumn("seg", seg_col)
    dl_with_seg = index.doclen.withColumn("seg", seg_col)

    def _encode_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        """Encode every (seg, term) group in one pandas frame (rows
        already sorted by seg, term, doc_id)."""
        rows = []
        for (seg, term), g in pdf.groupby(["seg", "term"], sort=False):
            docs = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            data, block_last, block_max, block_off = encode_postings(docs, tfs)
            rows.append(
                (
                    int(seg), term, len(docs), int(tfs.sum()),
                    block_last.tolist(), block_max.tolist(),
                    block_off.tolist(), data,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "seg", "term", "df", "cf",
                "block_last", "block_max", "block_off", "data",
            ],
        )

    def encode_partition(batches):
        """ONE python stage per partition: Arrow batches can split a
        (seg, term) group, so the trailing group of each batch is
        carried into the next. 20k+ tiny applyInPandas groups become
        ~#partitions mapInPandas calls (measured ~10x on 2 cores)."""
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_seg = pdf["seg"].iloc[-1]
            last_term = pdf["term"].iloc[-1]
            tail_mask = (pdf["seg"] == last_seg) & (pdf["term"] == last_term)
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield _encode_rows(head)
        if carry is not None and len(carry):
            yield _encode_rows(carry)

    def encode_doclens(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        doc_lo = seg * seg_size
        docs = pdf["doc_id"].to_numpy()
        dls = pdf["dl"].to_numpy()
        n = int(docs.max() - doc_lo + 1) if len(docs) else 0
        dense = np.zeros(n, np.uint64)  # docs with no tokens keep dl=0
        dense[docs - doc_lo] = dls.astype(np.uint64)
        return pd.DataFrame(
            {
                "seg": [seg],
                "doc_lo": [doc_lo],
                "n": [n],
                "dl_data": [varint_encode(dense).tobytes()],
            }
        )

    for g in range(groups):
        if g in m["completed_groups"]:
            continue
        t0 = time.time()
        segs_in_group = [s for s in range(n_segments) if s % groups == g]
        pg = with_seg.filter(F.col("seg") % groups == g)
        # hash-repartition on seg (a segment never splits across tasks
        # -> one parquet file per seg dir), sort by (seg, term, doc_id)
        # so the single-pass encoder sees contiguous groups AND parquet
        # row-group stats enable term-predicate pushdown at query time
        packed = (
            pg.repartition("seg")
            .sortWithinPartitions("seg", "term", "doc_id")
            .mapInPandas(encode_partition, schema=POSTINGS_SCHEMA)
        )
        packed.write.mode("overwrite").partitionBy("seg").parquet(
            os.path.join(out_path, "postings", f"group={g}")
        )

        dg = dl_with_seg.filter(F.col("seg") % groups == g)
        dg.groupBy("seg").applyInPandas(
            encode_doclens, schema=DOCLEN_SCHEMA
        ).write.mode("overwrite").partitionBy("seg").parquet(
            os.path.join(out_path, "doclens", f"group={g}")
        )

        elapsed = time.time() - t0
        n_rows = int(
            index.doclen.filter(
                ((F.col("doc_id") / seg_size).cast("int") % groups) == g
            ).count()
        )
        m["completed_groups"].append(g)
        m["lineage"].append(
            {
                "group": g,
                "segments": segs_in_group,
                "codec_version": CODEC_VERSION,
                "docs": n_rows,
                "seconds": round(elapsed, 3),
                "docs_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else None,
            }
        )
        _write_manifest(out_path, m)

    return SegmentIndex(
        path=out_path,
        n_docs=n_docs,
        avgdl=m["avgdl"],
        n_segments=n_segments,
        seg_size=seg_size,
    )


# ---------------------------------------------------------------------------
# query path: block-max pruned top-k over packed segments
# ---------------------------------------------------------------------------

def _decode_doclens(dl_data: bytes) -> np.ndarray:
    vals, _ = varint_decode(np.frombuffer(dl_data, dtype=np.uint8))
    return vals.astype(np.int64)


def _segment_topk(
    pdf: pd.DataFrame,
    boosts: dict[str, float],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> pd.DataFrame:
    """Exact top-k for one segment with MaxScore/block-max pruning.

    Terms are processed in descending upper-bound order (ub =
    boost*idf*(k1+1), the BM25 tf-part supremum). Once the remaining
    terms' summed ub can no longer lift a new doc over the current
    k-th score, later terms stop admitting new docs and only blocks
    overlapping existing candidates are decoded — the block-max /
    WAND-family pruning adapted to vectorized (Arrow batch) execution
    instead of per-doc pointer movement (SURVEY.md §4: custom logic,
    not a Catalyst rule).
    """
    dl_row = pdf[pdf["_kind"] == "dl"]
    if len(dl_row) == 0 or len(pdf[pdf["_kind"] == "post"]) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    doc_lo = int(dl_row["doc_lo"].iloc[0])
    dls = _decode_doclens(dl_row["data"].iloc[0])

    posts = pdf[pdf["_kind"] == "post"]
    terms = []
    for _, r in posts.iterrows():
        t = r["term"]
        ub = boosts[t] * idfs[t] * (k1 + 1.0)
        terms.append((ub, t, r))
    terms.sort(key=lambda x: (-x[0], x[1]))
    total_ub = sum(u for u, _, _ in terms)

    acc_docs = np.array([], dtype=np.int64)
    acc_scores = np.array([], dtype=np.float64)

    def bm25(tfs: np.ndarray, docs: np.ndarray, t: str) -> np.ndarray:
        dl = dls[docs - doc_lo].astype(np.float64)
        tf = tfs.astype(np.float64)
        return (
            boosts[t]
            * idfs[t]
            * tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )

    remaining = total_ub
    for ub, t, row in terms:
        remaining -= ub
        theta = (
            np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
            if len(acc_scores) >= k
            else -np.inf
        )
        admit_new = not (len(acc_scores) >= k and ub + remaining < theta)
        if admit_new:
            docs, tfs = decode_postings(row["data"])
        else:
            # non-essential term: no new doc it introduces can reach the
            # k-th score, so only contributions to existing candidates
            # matter — decode ONLY blocks that hold a candidate
            # (codec v2 per-block byte offsets; the PostingsEnum.advance
            # skip, BinaryTermExistsValueSource.java:128-147).
            block_last = np.asarray(row["block_last"], dtype=np.int64)
            if len(acc_docs) == 0 or len(block_last) == 0:
                continue
            need = np.unique(np.searchsorted(block_last, acc_docs))
            need = need[need < len(block_last)]
            if len(need) == 0:
                continue
            docs, tfs = decode_blocks(
                row["data"],
                need,
                np.asarray(row["block_off"], dtype=np.int64),
                block_last,
                int(row["df"]),
            )
            mask = np.isin(docs, acc_docs, assume_unique=True)
            docs, tfs = docs[mask], tfs[mask]
            if len(docs) == 0:
                continue
        scores = bm25(tfs, docs, t)
        # merge into accumulator (sorted arrays)
        all_docs = np.concatenate([acc_docs, docs])
        all_scores = np.concatenate([acc_scores, scores])
        order = np.argsort(all_docs, kind="stable")
        all_docs, all_scores = all_docs[order], all_scores[order]
        uniq, inv = np.unique(all_docs, return_inverse=True)
        summed = np.zeros(len(uniq), np.float64)
        np.add.at(summed, inv, all_scores)
        acc_docs, acc_scores = uniq, summed

    if len(acc_docs) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    top = min(k, len(acc_docs))
    # partial-select then exact sort of the head
    idx = np.argpartition(-acc_scores, top - 1)[:top]
    sel_docs, sel_scores = acc_docs[idx], acc_scores[idx]
    order = np.lexsort((sel_docs, -np.round(sel_scores, 12)))
    return pd.DataFrame(
        {"doc_id": sel_docs[order], "score": sel_scores[order]}
    )


def wand_search_multi(
    spark: SparkSession,
    seg_indexes: list[SegmentIndex],
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
) -> DataFrame:
    """Top-k across MULTIPLE packed indexes (e.g. streamed generations
    before compaction) with GLOBAL statistics.

    Generations hold disjoint doc sets, so df sums and avgdl is the
    token-weighted mean; each generation's segments are scored
    independently (seg ids namespaced per generation) and the k-row
    partials merge globally. Results equal a compacted/batch index
    (tests/test_streaming_payloads.py) — querying never has to wait
    for compaction.
    """
    n_docs = sum(s.n_docs for s in seg_indexes)
    total_tokens = sum(s.avgdl * s.n_docs for s in seg_indexes)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    merged = SegmentIndex(
        path="", n_docs=n_docs, avgdl=avgdl,
        n_segments=sum(s.n_segments for s in seg_indexes),
        seg_size=max(s.seg_size for s in seg_indexes),
    )
    return _wand_search_frames(
        spark,
        [(i, s) for i, s in enumerate(seg_indexes)],
        merged,
        terms_boosts,
        k=k, k1=k1, b=b, round_to=round_to,
    )


def wand_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
) -> DataFrame:
    """Distributed top-k over packed segments.

    Plan: parquet scan with term-isin pushdown (few rows per segment)
    -> per-segment pruned scoring in one Arrow batch -> global merge
    of n_segments*k rows (TakeOrderedAndProject). At 10^12 docs this
    is the query fast path: work per segment is bounded by the query's
    posting sizes, the merge is k rows per segment.
    """
    return _wand_search_frames(
        spark, [(0, seg_index)], seg_index, terms_boosts,
        k=k, k1=k1, b=b, round_to=round_to,
    )


def _wand_search_frames(
    spark: SparkSession,
    gens: list[tuple[int, SegmentIndex]],
    stats: SegmentIndex,
    terms_boosts: list[tuple[str, float]],
    k: int,
    k1: float,
    b: float,
    round_to: int,
) -> DataFrame:
    term_list = sorted({t for t, _ in terms_boosts})
    boosts: dict[str, float] = {}
    for t, w in terms_boosts:
        boosts[t] = boosts.get(t, 0.0) + float(w)

    posts = None
    dls = None
    for gen_id, si in gens:
        p = (
            spark.read.option("basePath", os.path.join(si.path, "postings"))
            .parquet(os.path.join(si.path, "postings"))
            .filter(F.col("term").isin(term_list))
            # namespace segment ids per generation so groups don't collide
            .withColumn("seg", F.col("seg") + F.lit(gen_id * 1_000_000))
        )
        d = (
            spark.read.option("basePath", os.path.join(si.path, "doclens"))
            .parquet(os.path.join(si.path, "doclens"))
            .withColumn("seg", F.col("seg") + F.lit(gen_id * 1_000_000))
        )
        posts = p if posts is None else posts.unionByName(p)
        dls = d if dls is None else dls.unionByName(d)

    # global df per term for idf (sum over segments + generations)
    df_rows = posts.groupBy("term").agg(F.sum("df").alias("df")).collect()
    n = stats.n_docs
    idfs = {
        r["term"]: float(np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)))
        for r in df_rows
    }
    if not idfs:
        return spark.createDataFrame([], "doc_id long, score double")

    unified = posts.select(
        "seg",
        F.lit("post").alias("_kind"),
        "term",
        "df",
        "block_last",
        "block_off",
        F.lit(None).cast("long").alias("doc_lo"),
        "data",
    ).unionByName(
        dls.select(
            "seg",
            F.lit("dl").alias("_kind"),
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("long").alias("df"),
            F.lit(None).cast("array<long>").alias("block_last"),
            F.lit(None).cast("array<long>").alias("block_off"),
            "doc_lo",
            F.col("dl_data").alias("data"),
        )
    )

    avgdl = stats.avgdl

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_topk(pdf, boosts, idfs, k, k1, b, avgdl)

    seg_tops = unified.groupBy("seg").applyInPandas(
        per_segment, schema="doc_id long, score double"
    )
    return (
        seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
