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
    key_cols: tuple[str, ...] | list[str] | None = None,
) -> bool:
    """Commit one microbatch as an index generation; returns True if it
    wrote, False if skipped (empty or already committed).

    ``key_cols`` (e.g. ``("conv_id", "turn_idx")``) additionally writes
    a ``keymap/gen=<id>`` parquet of (key cols..., doc_id) — the
    uniqueKey → internal-docid map that ``update_docs`` joins against
    to locate prior versions (Solr's updateDocument contract: the
    uniqueKey identifies the doc, the internal id is an engine
    detail). Exact multi-column equi-join keys, no hashing.

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
    if key_cols:
        batch_df.select(
            *key_cols, F.col(doc_col).cast("long").alias("doc_id")
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, "keymap", f"gen={batch_id}")
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


def update_docs(
    spark: SparkSession,
    inc_path: str,
    batch_df: DataFrame,
    key_cols: tuple[str, ...] | list[str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    max_replaced: int = 1_000_000,
    positions: bool = False,
    seg_size: int = 65536,
    seg_groups: int = 2,
    store_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    string_cols: list[str] | None = None,
) -> dict:
    """Solr's updateDocument over a streamed packed store: replace (or
    insert) documents identified by ``key_cols``, atomically from the
    reader's view. Lucene's exact mechanics, re-expressed:

    1. prior versions of the batch's keys are located via the
       ``keymap`` sidecars (one equi-join, never a corpus text scan)
       and tombstoned in their generations (``delete_docs`` — readers
       stop seeing them at postings-decode time);
    2. the new versions are committed as a fresh generation with FRESH
       internal doc ids above every id ever minted (ids are never
       reused, exactly Lucene's updateDocument = delete + add with a
       new internal docid), immediately servable by every
       multi-generation packed surface;
    3. ``compact_packed`` over ``packed_generations(inc_path)`` later
       purges the dead versions physically.

    Requirements: every committed generation was written with
    ``pack=True`` and the SAME ``key_cols`` (so the keymap exists),
    and ``batch_df`` holds at most one row per key (a distributed
    batch has no "last" write — reject ambiguity rather than pick
    one). New keys are plain inserts. Bounded driver work: the set of
    replaced (generation, doc_id) pairs is collected, capped at
    ``max_replaced`` — updates are microbatch-shaped, like Lucene's
    buffered deletes, not a corpus-wide rewrite (use delete_by_query +
    a rebuild for that).

    Returns {"generation", "n_docs", "n_replaced", "replaced_by_gen",
    "id_offset"}.
    """
    import glob as _glob

    from ..index.builder import mint_doc_ids
    from ..index.segments import delete_docs

    key_cols = list(key_cols)
    if "doc_id" in key_cols:
        raise ValueError(
            "update_docs: 'doc_id' is the engine's INTERNAL id (minted "
            "fresh per update, Lucene-style) — name the external key "
            "something else (e.g. ext_id) and key on that"
        )
    manifest = os.path.join(inc_path, "stream_manifest.jsonl")
    gens = sorted(_manifest_generations(manifest))
    if not gens:
        raise FileNotFoundError(
            f"update_docs: no committed generations under {inc_path!r}"
        )
    missing = [
        g
        for g in gens
        if not os.path.isdir(os.path.join(inc_path, "keymap", f"gen={g}"))
    ]
    if missing:
        raise ValueError(
            f"update_docs: generations {missing} have no keymap — commit "
            f"every generation with process_generation(..., key_cols="
            f"{tuple(key_cols)}) to make the store updatable"
        )
    no_segs = [
        g
        for g in gens
        if not os.path.isdir(os.path.join(inc_path, "segments", f"gen={g}"))
    ]
    if no_segs:
        raise ValueError(
            f"update_docs: generations {no_segs} are not packed "
            "(pack=True) — tombstones live on packed segments"
        )

    dup = (
        batch_df.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"update_docs: batch holds multiple rows for key "
            f"{tuple(dup[0][c] for c in key_cols)} — one row per key"
        )

    keymap = (
        spark.read.option("basePath", os.path.join(inc_path, "keymap"))
        .parquet(os.path.join(inc_path, "keymap"))
    )
    # one bounded job: prior (generation, doc_id) pairs of the batch's
    # keys + the global id high-water mark. The keymap is (keys, id)
    # only — grouping the max into the same pass would shuffle it; two
    # cheap aggregations beat one clever one here.
    old_rows = (
        keymap.join(batch_df.select(*key_cols), key_cols, "inner")
        .select("gen", "doc_id")
        .limit(max_replaced + 1)
        .collect()
    )
    if len(old_rows) > max_replaced:
        raise ValueError(
            f"update_docs: batch replaces more than max_replaced="
            f"{max_replaced} prior versions — split the update or raise "
            "the cap"
        )
    max_id = keymap.agg(F.max("doc_id")).collect()[0][0]
    offset = int(max_id) + 1

    by_gen: dict[int, list[int]] = {}
    for r in old_rows:
        by_gen.setdefault(int(r["gen"]), []).append(int(r["doc_id"]))
    replaced_by_gen = {}
    for g, ids in sorted(by_gen.items()):
        # n_new, not len(ids): a key updated twice re-matches its
        # already-tombstoned versions, and delete_docs unions those
        # away idempotently — count only the newly dead
        res = delete_docs(os.path.join(inc_path, "segments", f"gen={g}"), ids)
        replaced_by_gen[g] = res["n_new"]

    # fresh dense ids above the high-water mark, deterministically
    # ordered by the keys (partition-count independent)
    batch_new = mint_doc_ids(
        batch_df.drop("doc_id"), order_cols=tuple(key_cols)
    ).withColumn("doc_id", (F.col("doc_id") + F.lit(offset)).cast("long"))
    next_gen = max(gens) + 1
    n = batch_new.count()
    process_generation(
        batch_new,
        next_gen,
        inc_path,
        doc_col="doc_id",
        text_col=text_col,
        positions=positions,
        pack=True,
        seg_size=seg_size,
        seg_groups=seg_groups,
        store_cols=store_cols,
        value_cols=value_cols,
        string_cols=string_cols,
        key_cols=key_cols,
    )
    return {
        "generation": next_gen,
        "n_docs": int(n),
        "n_replaced": sum(replaced_by_gen.values()),
        "replaced_by_gen": replaced_by_gen,
        "id_offset": offset,
    }


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

    # this path re-builds from the FLAT generation postings, which know
    # nothing of tombstones — compacting a store that has deletions
    # (update_docs / delete_docs on a generation) here would resurrect
    # every dead version. compact_packed reads the packed binaries and
    # purges them instead.
    tombstoned = [
        int(d.rsplit("=", 1)[1])
        for d in _glob.glob(os.path.join(inc_path, "segments", "gen=*"))
        if os.path.isdir(os.path.join(d, "deletes"))
    ]
    if tombstoned:
        raise ValueError(
            f"compact_generations: generations {sorted(tombstoned)} carry "
            "tombstones — use compact_packed(spark, "
            "packed_generations(inc_path), out_path) so deleted/updated "
            "docs are purged, not resurrected"
        )

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
