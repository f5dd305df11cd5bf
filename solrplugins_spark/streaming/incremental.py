"""Incremental index builds via Structured Streaming.

The reference has no streams (SURVEY.md §2.9); its nearest analogues
are suggester rebuild-on-commit listeners
(DiceSpellCheckComponent.java:661-720) and NB model TTL refresh
(NaiveBayesComponent.java:386-388). The engine's upgrade is an
incremental build: new transcript partitions arrive -> each microbatch
becomes an index DELTA (postings + stats for its docs) appended as a
new segment generation; readers merge stats across generations.

Shape: ``readStream`` (file source or any streaming source) ->
``foreachBatch`` -> the SAME deterministic batch build path
(counted_terms), written parquet-partitioned by generation. Exactly
the north rule's resumable per-partition checkpointing: the streaming
checkpoint tracks consumed input, the manifest tracks emitted
generations, and a killed job resumes without recomputing finished
generations.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.tokenizer import counted_terms


def incremental_index_build(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    positions: bool = False,
    pack: bool = False,
    **pack_kwargs,
):
    """Start a streaming index build; returns the StreamingQuery.

    Each microbatch appends:
      postings/gen=<batch_id>/   (doc_id, term, tf, dl)
      terms/gen=<batch_id>/      (term, df, cf) partials
    and a manifest line with lineage + throughput (north-rule metrics).
    ``pack=True`` (+ process_generation's seg_size/seg_groups/
    store_cols/... kwargs) also packs each generation into servable
    segments — see process_generation.
    """
    os.makedirs(out_path, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_generation(
            batch_df, batch_id, out_path, doc_col, text_col,
            positions=positions, pack=pack, **pack_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _manifest_generations(manifest: str) -> set[int]:
    if not os.path.exists(manifest):
        return set()
    with open(manifest) as f:
        return {json.loads(line)["generation"] for line in f if line.strip()}


def process_generation(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    doc_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
    pack: bool = False,
    seg_size: int = 65536,
    seg_groups: int = 2,
    store_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    string_cols: list[str] | None = None,
) -> bool:
    """Commit one microbatch as an index generation; returns True if it
    wrote, False if skipped (empty or already committed).

    Idempotent per generation: foreachBatch is at-least-once, and the
    manifest line is appended LAST (after the idempotent parquet
    overwrites) — so a line for this generation means a previous
    attempt fully committed, and a replay must skip the append or
    compact_generations' sum over lines would inflate n_docs/avgdl
    and skew BM25 idf/norms after exactly the resume scenario this
    module exists for.

    ``pack=True`` additionally builds a PACKED per-generation
    SegmentIndex under ``segments/gen=<id>`` (with the termstats
    sidecar, plus any docstore/docvalues columns) — so every committed
    microbatch is IMMEDIATELY servable by the multi-generation packed
    surfaces (wand_boolean_search / packed_select_handler /
    packed_mlt_handler / packed_feedback_handler over
    ``packed_generations(out_path)``) without waiting for compaction.
    The packed build runs BEFORE the manifest append and is itself
    resumable (build_segments manifest), so a replayed batch finishes
    a half-built generation instead of double-committing.
    """
    manifest = os.path.join(out_path, "stream_manifest.jsonl")
    t0 = time.time()
    if int(batch_id) in _manifest_generations(manifest):
        return False
    n = batch_df.count()
    if n == 0:
        return False
    postings = counted_terms(
        batch_df, doc_col=doc_col, text_col=text_col, positions=positions
    )
    postings.write.mode("overwrite").parquet(
        os.path.join(out_path, "postings", f"gen={batch_id}")
    )
    terms = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
    )
    terms.write.mode("overwrite").parquet(
        os.path.join(out_path, "terms", f"gen={batch_id}")
    )
    if pack:
        from ..index.builder import InvertedIndex
        from ..index.segments import build_segments

        postings_w = postings.persist()
        total_dl = (
            postings_w.select(doc_col, "dl")
            .dropDuplicates([doc_col])
            .agg(F.sum("dl"))
            .collect()[0][0]
            or 0
        )
        docs = batch_df
        if doc_col != "doc_id":
            docs = docs.withColumnRenamed(doc_col, "doc_id")
            postings_w = postings_w.withColumnRenamed(doc_col, "doc_id")
        gen_idx = InvertedIndex(
            postings=postings_w,
            terms=terms,
            doclen=postings_w.select("doc_id", "dl").dropDuplicates(["doc_id"]),
            n_docs=int(n),
            avgdl=float(total_dl) / int(n),
            docs=docs,
            text_col=text_col,
        )
        build_segments(
            gen_idx,
            os.path.join(out_path, "segments", f"gen={batch_id}"),
            seg_size=seg_size,
            groups=seg_groups,
            store_cols=store_cols,
            value_cols=value_cols,
            string_cols=string_cols,
        )
        postings_w.unpersist()
    elapsed = time.time() - t0
    with open(manifest, "a") as f:
        f.write(
            json.dumps(
                {
                    "generation": int(batch_id),
                    "docs": int(n),
                    "seconds": round(elapsed, 3),
                    "docs_per_sec": round(n / elapsed, 1) if elapsed else None,
                }
            )
            + "\n"
        )
    return True


def compact_generations(
    spark: SparkSession,
    inc_path: str,
    out_path: str,
    seg_size: int = 65536,
    groups: int = 4,
):
    """Compact all streamed generations into packed segments.

    The sorted segment merge of SURVEY.md §7.9: generation posting
    frames are disjoint doc sets, so compaction is a union + the
    standard (resumable) packed build. N comes from the stream
    manifest (it counts every ingested doc, including token-less ones
    that left no postings). Query results over the compacted index are
    identical to a from-scratch batch build (tests).
    """
    import glob as _glob

    from ..index.builder import InvertedIndex
    from ..index.segments import build_segments
    from pyspark.sql import functions as F  # noqa: F811

    manifest = os.path.join(inc_path, "stream_manifest.jsonl")
    n_docs = 0
    with open(manifest) as f:
        for line in f:
            n_docs += json.loads(line)["docs"]

    postings = spark.read.option(
        "basePath", os.path.join(inc_path, "postings")
    ).parquet(os.path.join(inc_path, "postings")).drop("gen").persist()
    terms = merge_segment_stats(spark, inc_path)
    doclen = postings.select("doc_id", "dl").dropDuplicates(["doc_id"])
    total = postings.agg(F.sum("tf")).collect()[0][0] or 0
    idx = InvertedIndex(
        postings=postings,
        terms=terms,
        doclen=doclen,
        n_docs=n_docs,
        avgdl=float(total) / n_docs if n_docs else 0.0,
    )
    return build_segments(idx, out_path, seg_size=seg_size, groups=groups)


def merge_segment_stats(spark: SparkSession, out_path: str) -> DataFrame:
    """Merged term dictionary across all generations — the sorted
    segment-merge of SURVEY.md §7.9 expressed as a partial->final agg
    over generation partials (df/cf are additive because doc sets of
    generations are disjoint)."""
    terms = spark.read.option("basePath", os.path.join(out_path, "terms")).parquet(
        os.path.join(out_path, "terms")
    )
    return terms.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )


def packed_generations(out_path: str) -> list:
    """SegmentIndex list for every generation packed by
    ``process_generation(pack=True)``, ordered by generation id — the
    frame-of-reference for the multi-generation packed serving
    surfaces (wand_boolean_search / packed_select_handler /
    packed_mlt_handler / packed_feedback_handler all accept this list
    directly). Only generations whose stream-manifest line committed
    are returned: a half-written packed build without its manifest
    line is in-flight, not servable."""
    import glob as _glob

    from ..index.segments import SegmentIndex

    committed = _manifest_generations(
        os.path.join(out_path, "stream_manifest.jsonl")
    )
    out = []
    for d in sorted(
        _glob.glob(os.path.join(out_path, "segments", "gen=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    ):
        gen = int(d.rsplit("=", 1)[1])
        if gen in committed:
            out.append(SegmentIndex.load(d))
    return out
