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

from ..session import empty_df
from .builder import InvertedIndex
from .codec import (
    decode_blocks,
    decode_payloads,
    decode_positions,
    decode_postings,
    encode_payloads,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)

# v3: optional positions (pos_data/pos_off) + payload (pay_data)
# sub-streams per posting row, so phrase and payload queries run on
# the packed/WAND path (reference consumes these via Lucene postings:
# PayloadAwareDefaultSimilarity.java:10-16, RecursiveDescentParser
# .java:90-107 quoted phrases).
CODEC_VERSION = 3

POSTINGS_SCHEMA = (
    "seg int, term string, df long, cf long, "
    "block_last array<long>, block_max array<int>, block_off array<long>, "
    "data binary, pos_off array<long>, pos_data binary, pay_data binary"
)
DOCLEN_SCHEMA = "seg int, doc_lo long, n int, dl_data binary"


@dataclass
class SegmentIndex:
    path: str
    n_docs: int
    avgdl: float
    n_segments: int
    seg_size: int
    # sub-stream presence, recorded at build time (None = pre-r03
    # manifest, unknown): lets compaction fail fast on mixed inputs
    # instead of silently dropping positions for shared terms
    has_positions: bool | None = None
    has_payloads: bool | None = None
    # numeric docvalues streams packed alongside (build_segments
    # value_cols) — stored-column ranges on the packed path
    value_cols: tuple = ()
    # string ordinal docvalues (build_segments string_cols) — packed
    # faceting (wand_facet_search)
    string_cols: tuple = ()
    # stored-field columns (build_segments store_cols) — fetch_docs
    store_cols: tuple = ()
    # docstore DDL ("doc_id bigint, text string, ...") recorded at
    # build time so fetch_docs passes an explicit read schema —
    # parquet footer inference would cost one Spark job per request
    store_schema: str | None = None
    # tokenizer settings the flat index was built with — the packed
    # /mlt and /uf handlers re-analyze stored seed text and MUST
    # tokenize identically to the postings or rankings silently
    # diverge; recorded in the manifest, defaulted by the handlers
    tok_kwargs: dict | None = None

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
            has_positions=m.get("has_positions"),
            has_payloads=m.get("has_payloads"),
            value_cols=tuple(m.get("value_cols", [])),
            string_cols=tuple(m.get("string_cols", [])),
            store_cols=tuple(m.get("store_cols", [])),
            store_schema=m.get("store_schema"),
            tok_kwargs=m.get("tok_kwargs"),
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
    value_cols: list[str] | None = None,
    string_cols: list[str] | None = None,
    store_cols: list[str] | None = None,
) -> SegmentIndex:
    """Pack the flat index into compressed segments, resumably.

    Runs ``groups`` sequential Spark jobs, each building a slice of the
    segments; after each group commits (parquet written), its manifest
    entry is appended with lineage (segment range, row counts, codec
    version) and throughput. A killed build resumes from the manifest
    and yields byte-identical segments (content is a pure function of
    the flat index, which is deterministic given the corpus).

    ``value_cols``: non-negative integer columns of the stored corpus
    (``index.docs``) to pack as per-segment dense docvalues streams
    (the Lucene NumericDocValues analogue, varint-encoded like
    doclens) — enables stored-column range queries on the packed path
    (wand_boolean_search) without touching the corpus at query time.

    ``string_cols``: string columns to pack as ORDINAL docvalues (the
    SortedDocValues analogue): a global sorted value dictionary
    (docvalues_str/<col>/dict parquet, ordinals from 1; 0 = missing)
    plus per-segment dense ordinal streams — enables faceting over
    query docsets on the packed path (wand_facet_search) with
    segment-local counting.

    ``store_cols``: stored-field columns written seg-partitioned under
    docstore/ (the Lucene stored-fields / ir.document analogue) so
    ``fetch_docs`` can return full rows for a top-k result with
    partition-pruned point reads — no flat corpus needed at serve
    time.
    """
    spark = index.postings.sparkSession
    n_docs = index.n_docs
    n_segments = max(1, (n_docs + seg_size - 1) // seg_size)
    groups = min(groups, n_segments)
    value_cols = sorted(value_cols or [])
    string_cols = sorted(string_cols or [])
    store_cols = sorted(store_cols or [])
    for kind, cols in (
        ("value_cols", value_cols),
        ("string_cols", string_cols),
        ("store_cols", store_cols),
    ):
        if cols:
            if index.docs is None:
                raise ValueError(f"{kind} needs the stored corpus (index.docs)")
            missing = [c for c in cols if c not in index.docs.columns]
            if missing:
                raise ValueError(f"{kind} not in corpus: {missing}")

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
            "has_positions": "positions" in index.postings.columns,
            "has_payloads": "payload" in index.postings.columns,
            "value_cols": value_cols,
            "string_cols": string_cols,
            "store_cols": store_cols,
            "store_schema": (
                ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in index.docs.select("doc_id", *store_cols).schema.fields
                )
                if store_cols
                else None
            ),
            "tok_kwargs": dict(getattr(index, "tok_kwargs", {}) or {}),
            "completed_groups": [],
            "lineage": [],
        }
        _write_manifest(out_path, m)
    else:
        assert m["n_docs"] == n_docs and m["seg_size"] == seg_size, (
            "resume with different corpus/params — wipe the output dir"
        )
        assert m.get("value_cols", []) == value_cols, (
            "resume with different value_cols — wipe the output dir"
        )
        assert m.get("string_cols", []) == string_cols, (
            "resume with different string_cols — wipe the output dir"
        )
        assert m.get("store_cols", []) == store_cols, (
            "resume with different store_cols — wipe the output dir"
        )

    # a different `groups` would change the seg%groups assignment and
    # re-write segments already covered by completed groups into new
    # group=* dirs — duplicated postings at query time. Derive groups
    # from the manifest so resume is always safe (no-op on creation,
    # where the manifest was just written with n_groups=groups).
    groups = m["n_groups"]

    # global ordinal dictionaries (sorted values, ordinals from 1;
    # 0 = missing) — written once before the group loop so per-group
    # ordinal streams can join against them; resumable via manifest
    if string_cols and not m.get("string_dicts"):
        from pyspark.sql import Window as _W

        for sc in string_cols:
            (
                index.docs.select(F.col(sc).alias("value"))
                .filter(F.col("value").isNotNull())
                .distinct()
                # global row_number = single-partition window: fine
                # here because facet dictionaries are by definition
                # low-cardinality (they get counted into one response);
                # high-cardinality columns belong in value_cols/ranges
                .withColumn(
                    "ord",
                    F.row_number().over(_W.orderBy("value")).cast("long"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(out_path, "docvalues_str", sc, "dict"))
            )
        m["string_dicts"] = True
        _write_manifest(out_path, m)

    seg_col = (F.col("doc_id") / seg_size).cast("int")
    with_seg = index.postings.withColumn("seg", seg_col)
    dl_with_seg = index.doclen.withColumn("seg", seg_col)

    def _encode_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        """Encode every (seg, term) group in one pandas frame (rows
        already sorted by seg, term, doc_id). Optional `positions` /
        `payload` input columns become the v3 sub-streams."""
        has_pos = "positions" in pdf.columns
        has_pay = "payload" in pdf.columns
        rows = []
        for (seg, term), g in pdf.groupby(["seg", "term"], sort=False):
            docs = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            data, block_last, block_max, block_off = encode_postings(docs, tfs)
            pos_off, pos_data, pay_data = None, None, None
            if has_pos:
                pos_data, po = encode_positions(list(g["positions"]), tfs)
                pos_off = po.tolist()
            if has_pay:
                pay_data = encode_payloads(g["payload"].to_numpy())
            rows.append(
                (
                    int(seg), term, len(docs), int(tfs.sum()),
                    block_last.tolist(), block_max.tolist(),
                    block_off.tolist(), data, pos_off, pos_data, pay_data,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "seg", "term", "df", "cf",
                "block_last", "block_max", "block_off", "data",
                "pos_off", "pos_data", "pay_data",
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

    # lineage doc counts for every pending group in ONE aggregation —
    # counting inside the loop cost one full doclen scan PER GROUP
    # (4 extra jobs at the bench shape), pure overhead next to the
    # encode jobs that already touch the same rows
    pending = [g for g in range(groups) if g not in m["completed_groups"]]
    group_rows: dict[int, int] = {}
    if pending:
        group_rows = {
            int(r["g"]): int(r["cnt"])
            for r in index.doclen.groupBy(
                (((F.col("doc_id") / seg_size).cast("int")) % groups).alias("g")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    for g in range(groups):
        if g in m["completed_groups"]:
            continue
        t0 = time.time()
        segs_in_group = [s for s in range(n_segments) if s % groups == g]

        # The per-group streams (postings, doclens, docvalues, docstore,
        # ordinals) are INDEPENDENT writes over different projections of
        # the same inputs, and each alone under-fills the cluster (a
        # group holds n_segments/groups segments, so repartition('seg')
        # stages run that many tasks). Submitting them from a small
        # thread pool overlaps their tails (guide-standard concurrent
        # independent jobs; Spark's FIFO scheduler back-fills freed
        # cores), while the GROUP loop stays sequential — the group is
        # the resume/commit unit, and the manifest entry is appended
        # only after every stream's write has joined.
        def _write_postings(g=g):
            pg = with_seg.filter(F.col("seg") % groups == g)
            # hash-repartition on seg (a segment never splits across
            # tasks -> one parquet file per seg dir), sort by
            # (seg, term, doc_id) so the single-pass encoder sees
            # contiguous groups AND parquet row-group stats enable
            # term-predicate pushdown at query time
            (
                pg.repartition("seg")
                .sortWithinPartitions("seg", "term", "doc_id")
                .mapInPandas(encode_partition, schema=POSTINGS_SCHEMA)
                .write.mode("overwrite").partitionBy("seg")
                .parquet(os.path.join(out_path, "postings", f"group={g}"))
            )

        def _write_doclens(g=g):
            dg = dl_with_seg.filter(F.col("seg") % groups == g)
            dg.groupBy("seg").applyInPandas(
                encode_doclens, schema=DOCLEN_SCHEMA
            ).write.mode("overwrite").partitionBy("seg").parquet(
                os.path.join(out_path, "doclens", f"group={g}")
            )

        def _make_encode_values(_col: str):
            # factory, NOT a default arg: applyInPandas dispatches on
            # arity, and a 2-arg function would be called as (key, pdf)
            def encode_values(pdf: pd.DataFrame) -> pd.DataFrame:
                seg = int(pdf["seg"].iloc[0])
                v_lo = seg * seg_size
                docs = pdf["doc_id"].to_numpy()
                vals = pdf[_col].to_numpy()
                if not np.issubdtype(vals.dtype, np.integer):
                    raise ValueError(
                        f"docvalues column {_col!r} must be integer-typed "
                        f"(got {vals.dtype}) — floats would silently "
                        "truncate and diverge from the flat range filter; "
                        "cast explicitly or scale to integers first"
                    )
                assert vals.min() >= 0, f"value_cols must be non-negative: {_col}"
                n = int(docs.max() - v_lo + 1) if len(docs) else 0
                dense = np.zeros(n, np.uint64)
                dense[docs - v_lo] = vals.astype(np.uint64)
                return pd.DataFrame(
                    {
                        "seg": [seg],
                        "doc_lo": [v_lo],
                        "n": [n],
                        "dl_data": [varint_encode(dense).tobytes()],
                    }
                )

            return encode_values

        def _write_values(vc, g=g):
            (
                index.docs.select("doc_id", vc)
                .withColumn("seg", seg_col)
                .filter(F.col("seg") % groups == g)
                .groupBy("seg")
                .applyInPandas(_make_encode_values(vc), schema=DOCLEN_SCHEMA)
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(os.path.join(out_path, "docvalues", vc, f"group={g}"))
            )

        def _write_store(g=g):
            # repartition('seg') + in-partition doc_id sort: one file
            # per seg with monotone doc_ids, so fetch_docs' doc_id-isin
            # predicate prunes row groups instead of scanning every
            # upstream task's interleaved output (same discipline as
            # the postings/doclens/docvalues writes)
            (
                index.docs.select("doc_id", *store_cols)
                .withColumn("seg", seg_col)
                .filter(F.col("seg") % groups == g)
                .repartition("seg")
                .sortWithinPartitions("seg", "doc_id")
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(os.path.join(out_path, "docstore", f"group={g}"))
            )

        def _write_ordinals(sc, g=g):
            dict_df = spark.read.parquet(
                os.path.join(out_path, "docvalues_str", sc, "dict")
            )
            ords = index.docs.select("doc_id", F.col(sc).alias("value")).join(
                F.broadcast(dict_df), "value", "left"
            ).select("doc_id", F.coalesce("ord", F.lit(0)).alias("_ord"))
            (
                ords.withColumn("seg", seg_col)
                .filter(F.col("seg") % groups == g)
                .groupBy("seg")
                .applyInPandas(_make_encode_values("_ord"), schema=DOCLEN_SCHEMA)
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(
                    os.path.join(
                        out_path, "docvalues_str", sc, "streams", f"group={g}"
                    )
                )
            )

        from concurrent.futures import ThreadPoolExecutor

        jobs = [_write_postings, _write_doclens]
        jobs += [lambda vc=vc: _write_values(vc) for vc in value_cols]
        if store_cols:
            jobs.append(_write_store)
        jobs += [lambda sc=sc: _write_ordinals(sc) for sc in string_cols]
        # stream-write concurrency (env-tunable: this sandbox serializes
        # syscalls globally, so concurrent shuffles can contend — the
        # default is picked by A/B on the bench shape; a real cluster
        # would raise it)
        workers = int(os.environ.get("SOLRPLUGINS_BUILD_STREAM_WORKERS", "2"))
        if len(jobs) == 1 or workers <= 1:
            for j in jobs:
                j()
        else:
            with ThreadPoolExecutor(max_workers=min(workers, len(jobs))) as pool:
                futures = [pool.submit(j) for j in jobs]
                for f in futures:
                    f.result()  # re-raise the first failure

        elapsed = time.time() - t0
        n_rows = group_rows.get(g, 0)
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

    # term->(df, cf) sidecar, range-partitioned + sorted by term:
    # query-time idf comes from a driver-side pyarrow row-group-pruned
    # read (O(query terms)), NOT a per-query Spark job over postings
    # metadata — a WAND query is ONE Spark job. The same sidecar is the
    # packed tier's term DICTIONARY (index.dictionary: serve-tier
    # spellcheck / suggest / /terms have no flat terms frame at 100-TB
    # scale) — cf rides along for /terms parity, and the explicit
    # repartitionByRange keeps every file a disjoint term range so a
    # prefix predicate prunes at file/row-group granularity no matter
    # how AQE would have coalesced the write. Written after all groups
    # (df is global), resumable via the manifest flag.
    if not m.get("termstats"):
        (
            index.terms.select("term", "df", "cf")
            .repartitionByRange(max(2, groups), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(out_path, "termstats"))
        )
        m["termstats"] = True
        _write_manifest(out_path, m)

    return SegmentIndex(
        path=out_path,
        n_docs=n_docs,
        avgdl=m["avgdl"],
        n_segments=n_segments,
        seg_size=seg_size,
        has_positions=m.get("has_positions"),
        has_payloads=m.get("has_payloads"),
        value_cols=tuple(m.get("value_cols", [])),
        string_cols=tuple(m.get("string_cols", [])),
        store_cols=tuple(m.get("store_cols", [])),
        store_schema=m.get("store_schema"),
        tok_kwargs=m.get("tok_kwargs"),
    )


# ---------------------------------------------------------------------------
# query path: block-max pruned top-k over packed segments
# ---------------------------------------------------------------------------


def _as_gens(seg_index) -> list:
    """Normalize a SegmentIndex-or-generation-list into the
    [(gen_id, SegmentIndex)] shape every multi-generation surface
    consumes — the ONE place the generation contract (list = streamed
    deltas with disjoint doc sets; gen ids namespace seg ids by
    gen_id*1e6) is encoded."""
    if isinstance(seg_index, (list, tuple)):
        return list(enumerate(seg_index))
    return [(0, seg_index)]

# below this many total segments, serving queries skip the
# groupBy(seg) exchange (see _apply_per_segment): the whole pruned
# frame fits one task and the saved shuffle+stage round-trip dominates
SINGLE_STAGE_MAX_SEGMENTS = 64

# ... but segment COUNT is the wrong criterion when the pruned bytes
# are large: a 61-segment index still passes the count check while a
# head-term phrase decodes ~80 MB in that ONE task (measured 1.6 s at
# a 4M-turn shape — the worst of all strategies). When the driver-side
# byte estimate exceeds this, the exchange path parallelizes the
# per-segment kernels instead; the saved stage round-trip no longer
# dominates at that size.
SINGLE_STAGE_MAX_BYTES = 64 << 20

# ---------------------------------------------------------------------------
# driver-local serving tier (r07): when the bytes a query must touch are
# provably bounded (estimated DRIVER-SIDE from the termstats sidecar and
# stream-directory sizes, before anything is read), the pruned postings/
# doclen rows are read with pyarrow and the SAME per-segment kernels run
# in-process — the Lucene/Solr shard-serving shape, where a bounded top-k
# never launches a distributed job. Above the byte budget (head terms at
# 10^12 docs, large indexes) every surface falls back to the unchanged
# Spark fan-out, so the 100-TB plan shape is untouched. Same kernels +
# same inputs = bit-identical scores (tests/test_local_tier.py pins
# local == exchange-path equality across surfaces).
# ---------------------------------------------------------------------------

# Driver byte budget for the local tier. ~64 MB decodes in well under a
# serving latency budget on one core; anything bigger belongs on the
# cluster. 0 disables the local tier (pure distributed, for A/B and for
# deployments that want the driver doing strictly no data work).
LOCAL_TIER_MAX_BYTES = int(
    os.environ.get("SOLRPLUGINS_LOCAL_TIER_MAX_BYTES", str(64 << 20))
)

# conservative per-posting byte costs for the sidecar-based estimate
# (delta-varint doc + tf is ~2-3 B/posting; block metadata adds
# ~24 B / 128 postings): 4 B/posting overshoots on purpose.
_EST_BYTES_PER_POSTING = 4
# positions sub-stream: ~2-3 B/occurrence varint + 8 B/posting pos_off
_EST_BYTES_PER_OCCURRENCE = 3
_EST_BYTES_POS_OFF = 10


def _dir_bytes(path: str) -> int:
    """Total on-disk bytes under ``path`` (0 if absent) — driver-side
    stat walk over O(n_segments) files, no Spark job."""
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _local_tier_budget() -> int:
    """Re-read the env override at call time so tests/ops can flip the
    tier without re-importing; falls back to the module default."""
    v = os.environ.get("SOLRPLUGINS_LOCAL_TIER_MAX_BYTES")
    return int(v) if v is not None else LOCAL_TIER_MAX_BYTES


def _local_estimate(
    pairs: list[tuple["SegmentIndex", list[str]]],
    with_subs: bool,
    extra_dirs: list[str] = (),
    stats_list: list | None = None,
) -> int | None:
    """Upper-bound estimate of the bytes a local-tier execution would
    read: per-term postings (df/cf from the termstats sidecar — the
    same driver-side pyarrow read every query already does for idf) +
    the full doclens / deletes streams + any docvalues/ordinal stream
    directories the caller needs. None = no sidecar (pre-sidecar
    index) -> distributed path. ``stats_list`` (aligned with
    ``pairs``) lets callers that already fetched the sidecar stats
    for idf skip a second read — dataset discovery alone costs
    ~10-20 ms per read."""
    total = 0
    for i, (si, terms) in enumerate(pairs):
        stats = (
            stats_list[i]
            if stats_list is not None
            else _sidecar_stats(si.path, terms)
        )
        if stats is None:
            return None
        for df_t, cf_t in stats.values():
            total += int(df_t) * _EST_BYTES_PER_POSTING
            if with_subs:
                total += (
                    int(df_t) * _EST_BYTES_POS_OFF
                    + int(cf_t) * _EST_BYTES_PER_OCCURRENCE
                )
        total += _dir_bytes(os.path.join(si.path, "doclens"))
        total += _dir_bytes(_deletes_dir(si.path))
    for d in extra_dirs:
        total += _dir_bytes(d)
    return total


def _local_ok(
    pairs: list[tuple["SegmentIndex", list[str]]],
    with_subs: bool,
    extra_dirs: list[str] = (),
    stats_list: list | None = None,
) -> bool:
    budget = _local_tier_budget()
    if budget <= 0:
        return False
    est = _local_estimate(pairs, with_subs, extra_dirs, stats_list)
    return est is not None and est <= budget


_UNIFIED_COLS = [
    "seg", "_kind", "fld", "term", "df",
    "block_last", "block_max", "block_off", "doc_lo", "data",
]
_SUB_COLS = ["pos_off", "pos_data", "pay_data"]


def _unified_part(
    n: int,
    seg: np.ndarray,
    kind: str,
    field: str,
    with_subs: bool,
    **cols,
) -> pd.DataFrame:
    """One _kind slice of the local unified frame, with every column of
    the Spark twin present (None-filled where that kind has no data) so
    the kernels see the exact applyInPandas shape."""
    out = pd.DataFrame({"seg": seg.astype(np.int64)})
    out["_kind"] = kind
    out["fld"] = field
    for c in _UNIFIED_COLS[3:] + (_SUB_COLS if with_subs else []):
        if c in cols:
            out[c] = cols[c]
        else:
            out[c] = pd.Series([None] * n, dtype="object")
    return out


def _unified_pdf(
    gens: list[tuple[int, "SegmentIndex"]],
    term_list: list[str],
    with_subs: bool = False,
    field: str = "",
) -> pd.DataFrame:
    """Local-tier twin of _unified_frame: the SAME rows (term-pruned
    postings + doclens + tombstones, per-generation seg namespacing,
    identical column set and within-segment row order — postings files
    are (seg, term)-sorted) assembled driver-side with pyarrow."""
    import pyarrow.dataset as ds

    if not term_list:
        term_list = ["\x00none"]  # empty isin crashes pyarrow's set bind
    parts: list[pd.DataFrame] = []
    post_cols = [
        "seg", "term", "df", "block_last", "block_max", "block_off", "data",
    ] + (_SUB_COLS if with_subs else [])
    for gen_id, si in gens:
        tbl = ds.dataset(
            os.path.join(si.path, "postings"),
            format="parquet",
            partitioning="hive",
        ).to_table(columns=post_cols, filter=ds.field("term").isin(term_list))
        pdf = tbl.to_pandas()
        kw = {
            "term": pdf["term"].astype(object),
            "df": pdf["df"].to_numpy(np.int64),
            "block_last": pdf["block_last"].astype(object),
            "block_max": pdf["block_max"].astype(object),
            "block_off": pdf["block_off"].astype(object),
            "data": pdf["data"].astype(object),
        }
        if with_subs:
            kw.update(
                pos_off=pdf["pos_off"].astype(object),
                pos_data=pdf["pos_data"].astype(object),
                pay_data=pdf["pay_data"].astype(object),
            )
        parts.append(
            _unified_part(
                len(pdf),
                pdf["seg"].to_numpy(np.int64) + gen_id * 1_000_000,
                "post", field, with_subs, **kw,
            )
        )
    for gen_id, si in gens:
        tbl = ds.dataset(
            os.path.join(si.path, "doclens"),
            format="parquet",
            partitioning="hive",
        ).to_table(columns=["seg", "doc_lo", "dl_data"])
        pdf = tbl.to_pandas()
        parts.append(
            _unified_part(
                len(pdf),
                pdf["seg"].to_numpy(np.int64) + gen_id * 1_000_000,
                "dl", field, with_subs,
                doc_lo=pdf["doc_lo"].to_numpy(np.int64),
                data=pdf["dl_data"].astype(object),
            )
        )
    for gen_id, si in gens:
        ddir = _deletes_dir(si.path)
        if os.path.isdir(ddir):
            tbl = ds.dataset(ddir, format="parquet").to_table(
                columns=["seg", "doc_lo", "dl_data"]
            )
            pdf = tbl.to_pandas()
            parts.append(
                _unified_part(
                    len(pdf),
                    pdf["seg"].to_numpy(np.int64) + gen_id * 1_000_000,
                    "del", field, with_subs,
                    doc_lo=pdf["doc_lo"].to_numpy(np.int64),
                    data=pdf["dl_data"].astype(object),
                )
            )
    return pd.concat(parts, ignore_index=True)


def _dv_pdf(
    si: "SegmentIndex",
    col: str,
    with_subs: bool,
    subdir: str = "docvalues",
    seg_offset: int = 0,
) -> pd.DataFrame:
    """Local-tier twin of _dv_frame (one numeric/ordinal docvalues
    stream shaped as _kind='dv' rows)."""
    import pyarrow.dataset as ds

    base = (
        os.path.join(si.path, subdir, col)
        if subdir == "docvalues"
        else os.path.join(si.path, subdir, col, "streams")
    )
    tbl = ds.dataset(base, format="parquet", partitioning="hive").to_table(
        columns=["seg", "doc_lo", "dl_data"]
    )
    pdf = tbl.to_pandas()
    return _unified_part(
        len(pdf),
        pdf["seg"].to_numpy(np.int64) + seg_offset,
        "dv", "", with_subs,
        term=pd.Series([col] * len(pdf), dtype="object"),
        doc_lo=pdf["doc_lo"].to_numpy(np.int64),
        data=pdf["dl_data"].astype(object),
    )


def _stack(a, b):
    """Union two unified frames of the same tier (Spark DataFrame or
    local pandas frame)."""
    if a is None:
        return b
    if isinstance(a, pd.DataFrame):
        return pd.concat([a, b], ignore_index=True)
    return a.unionByName(b)


def _n_segments_hint(*seg_objs) -> int:
    """Total segment count across SegmentIndexes / generation lists /
    None — driver-side from manifests, no Spark job. Decides the
    physical strategy in _apply_per_segment."""
    tot = 0
    for so in seg_objs:
        if so is None:
            continue
        for _, si in _as_gens(so):
            tot += si.n_segments
    return tot


def _kernel_pdf(unified_pdf: pd.DataFrame, per_segment) -> pd.DataFrame | None:
    """Run the per-segment kernel over a local-tier unified frame —
    the driver-side twin of groupBy(seg).applyInPandas. None when no
    segment produced rows."""
    outs = []
    if len(unified_pdf):
        for _, g in unified_pdf.groupby("seg", sort=False):
            out = per_segment(g.reset_index(drop=True))
            if len(out):
                outs.append(out)
    if not outs:
        return None
    return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]


def _local_topk_frame(
    spark: SparkSession,
    res: pd.DataFrame | None,
    k: int,
    round_to: int,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Driver-side finalization of a local-tier top-k: the Spark tail
    (round -> cursor re-check -> orderBy -> limit) over a bounded
    local relation still scheduled one mini job (~70-100 ms on this
    host); the identical semantics are pure arithmetic here —
    _spark_round IS F.round (exact HALF_UP) and the (score desc,
    doc_id asc) lexsort IS the orderBy — so a local-tier top-k query
    runs ZERO Spark jobs (the returned pre-computed local relation
    collects via executeCollect on the driver). The returned frame is
    tagged ``_spl_local`` so bounded handler tails (seed exclusion +
    re-top-k) can finalize driver-side instead of scheduling a
    filter/orderBy/limit job over a local relation."""
    if res is None or not len(res):
        out = empty_df(spark, "doc_id long, score double")
        out._spl_local = True
        return out
    ids = res["doc_id"].to_numpy(np.int64)
    scores = _spark_round(res["score"].to_numpy(np.float64), round_to)
    if after is not None:
        s_a, d_a = float(after[0]), int(after[1])
        keep = (scores < s_a) | ((scores == s_a) & (ids > d_a))
        ids, scores = ids[keep], scores[keep]
        if not len(ids):
            out = empty_df(spark, "doc_id long, score double")
            out._spl_local = True
            return out
    order = np.lexsort((ids, -scores))[: min(k, len(ids))]
    out = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids[order], "score": scores[order]}),
        schema="doc_id long, score double",
    )
    out._spl_local = True
    return out


def _local_dict_map(gens, col: str) -> dict:
    """(gen, ord) -> value from the per-generation ordinal
    dictionaries — the driver-side twin of the broadcast dictionary
    join (facet vocabularies are bounded by construction)."""
    import pyarrow.parquet as pq

    out: dict = {}
    for gen_id, si in gens:
        dpath = os.path.join(si.path, "docvalues_str", col, "dict")
        tbl = pq.read_table(dpath, columns=["value", "ord"])
        for v, o in zip(
            tbl.column("value").to_pylist(), tbl.column("ord").to_pylist()
        ):
            out[(gen_id, int(o))] = v
    return out


def _null_first_sorted(keys) -> list:
    """Sort facet values like Spark's ASC NULLS FIRST (UTF-8 binary
    order == Python code-point order for str)."""
    return sorted(keys, key=lambda v: (v is not None, v if v is not None else ""))


def _local_facet_counts(spark, res, gens, facet_col: str) -> DataFrame:
    """Driver-side tail of wand_facet_search on the local tier: the
    (gen,ord) partial-sum -> dictionary join -> value sum chain over a
    bounded local relation scheduled two mini Spark jobs of pure
    scheduling; integer count sums are order-independent, so the same
    merge is exact here. Output order is value-sorted (the surface has
    no ordering contract — callers sort)."""
    schema = f"{facet_col} string, cnt long"
    if res is None:
        return empty_df(spark, schema)
    dmap = _local_dict_map(gens, facet_col)
    agg: dict = {}
    for g, o, c in zip(
        res["gen"].to_numpy(), res["ord"].to_numpy(), res["cnt"].to_numpy()
    ):
        v = dmap.get((int(g), int(o)))
        agg[v] = agg.get(v, 0) + int(c)
    vals = _null_first_sorted(agg)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                facet_col: vals,
                "cnt": np.array([agg[v] for v in vals], np.int64),
            }
        ),
        schema=schema,
    )


def _local_collapse_topk(spark, res, gens, collapse_col: str, k: int) -> DataFrame:
    """Driver-side tail of wand_collapse_search: per-value winner under
    the (score, -doc_id) comparator (max_by's struct comparison IS
    Python tuple comparison; scores are already kernel-rounded), then
    the (score desc, doc_id asc) top-k lexsort."""
    schema = f"{collapse_col} string, doc_id long, score double"
    if res is None:
        return empty_df(spark, schema)
    dmap = _local_dict_map(gens, collapse_col)
    best: dict = {}
    for g, o, d, s in zip(
        res["gen"].to_numpy(), res["ord"].to_numpy(),
        res["doc_id"].to_numpy(), res["score"].to_numpy(),
    ):
        v = dmap.get((int(g), int(o)))
        key = (float(s), -int(d))
        cur = best.get(v)
        if cur is None or key > cur[0]:
            best[v] = (key, int(d), float(s))
    vals = list(best)
    ids = np.array([best[v][1] for v in vals], np.int64)
    scores = np.array([best[v][2] for v in vals], np.float64)
    order = np.lexsort((ids, -scores))[: min(k, len(ids))]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                collapse_col: [vals[i] for i in order],
                "doc_id": ids[order],
                "score": scores[order],
            }
        ),
        schema=schema,
    )


def _local_facet_range(spark, res, start: int, gap: int, n_buckets: int) -> DataFrame:
    """Driver-side tail of wand_facet_range_search: the full bucket
    lattice with zero counts served (Solr returns every bucket), in
    bucket order — integer sums, exact."""
    cnts = np.zeros(n_buckets, np.int64)
    if res is not None:
        for o, c in zip(res["ord"].to_numpy(), res["cnt"].to_numpy()):
            o = int(o)
            if 0 <= o < n_buckets:
                cnts[o] += int(c)
    buckets = np.int64(start) + np.arange(n_buckets, dtype=np.int64) * np.int64(gap)
    return spark.createDataFrame(
        pd.DataFrame({"bucket": buckets, "cnt": cnts}),
        schema="bucket long, cnt long",
    )


_STATS_SCHEMA = (
    "cnt long, min_v long, max_v long, sum_v long, mean_v double, stddev_v double"
)


def _stats_row(n: int, s: float, ss: float, mn: float, mx: float, round_to: int):
    """One merged-moments stats row — StatsValuesFactory's corrected
    formula with the same n==1 NULL rule and cancellation clamp as the
    Spark tail; double->long casts truncate toward zero exactly like
    Spark's cast."""
    mean = float(_spark_round(np.array([s / n]), round_to)[0])
    if n > 1:
        var = max(ss - s * s / n, 0.0) / (n - 1)
        std = float(_spark_round(np.array([float(np.sqrt(var))]), round_to)[0])
    else:
        std = None
    return (np.int64(n), np.int64(int(mn)), np.int64(int(mx)),
            np.int64(int(s)), mean, std)


def _local_stats(spark, res, round_to: int) -> DataFrame:
    """Driver-side tail of wand_stats_search: sequential left-to-right
    float accumulation in partials row order — bit-for-bit what
    Spark's single-partition agg over the same local relation does."""
    if res is None:
        return empty_df(spark, _STATS_SCHEMA)
    n = 0
    s = ss = 0.0
    mn = mx = None
    for c, sv, ssv, mnv, mxv in zip(
        res["cnt"].to_numpy(), res["s"].to_numpy(), res["ss"].to_numpy(),
        res["mn"].to_numpy(), res["mx"].to_numpy(),
    ):
        n += int(c)
        s += float(sv)
        ss += float(ssv)
        mn = float(mnv) if mn is None else min(mn, float(mnv))
        mx = float(mxv) if mx is None else max(mx, float(mxv))
    if n <= 0:
        return empty_df(spark, _STATS_SCHEMA)
    cnt, min_v, max_v, sum_v, mean, std = _stats_row(n, s, ss, mn, mx, round_to)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "cnt": [cnt], "min_v": [min_v], "max_v": [max_v],
                "sum_v": [sum_v], "mean_v": [mean],
                "stddev_v": pd.array([std], dtype=object),
            }
        ),
        schema=_STATS_SCHEMA,
    )


def _local_facet_query_counts(spark, res) -> DataFrame:
    """Driver-side tail of wand_facet_query_search: per-name integer
    count sums, name-ordered (the orderBy of the Spark tail)."""
    schema = "name string, cnt long"
    if res is None:
        return empty_df(spark, schema)
    agg: dict = {}
    for nm, c in zip(res["name"], res["cnt"].to_numpy()):
        agg[nm] = agg.get(nm, 0) + int(c)
    names = sorted(agg)
    return spark.createDataFrame(
        pd.DataFrame(
            {"name": names, "cnt": np.array([agg[n] for n in names], np.int64)}
        ),
        schema=schema,
    )


def _local_stats_facet(spark, res, gens, facet_col: str, round_to: int) -> DataFrame:
    """Driver-side tail of wand_stats_facet_search: moments merge per
    facet value (sequential accumulation in partials row order, the
    broadcast-join row order of the Spark tail), empty buckets absent,
    value-ordered ASC NULLS FIRST."""
    schema = f"{facet_col} string, " + _STATS_SCHEMA
    if res is None:
        return empty_df(spark, schema)
    dmap = _local_dict_map(gens, facet_col)
    acc: dict = {}
    for g, o, c, sv, ssv, mnv, mxv in zip(
        res["gen"].to_numpy(), res["ord"].to_numpy(), res["cnt"].to_numpy(),
        res["s"].to_numpy(), res["ss"].to_numpy(),
        res["mn"].to_numpy(), res["mx"].to_numpy(),
    ):
        v = dmap.get((int(g), int(o)))
        a = acc.get(v)
        if a is None:
            acc[v] = [int(c), float(sv), float(ssv), float(mnv), float(mxv)]
        else:
            a[0] += int(c)
            a[1] += float(sv)
            a[2] += float(ssv)
            a[3] = min(a[3], float(mnv))
            a[4] = max(a[4], float(mxv))
    vals = [v for v in _null_first_sorted(acc) if acc[v][0] > 0]
    if not vals:
        return empty_df(spark, schema)
    rows = [_stats_row(*acc[v], round_to) for v in vals]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                facet_col: vals,
                "cnt": [r[0] for r in rows],
                "min_v": [r[1] for r in rows],
                "max_v": [r[2] for r in rows],
                "sum_v": [r[3] for r in rows],
                "mean_v": [r[4] for r in rows],
                "stddev_v": pd.array([r[5] for r in rows], dtype=object),
            }
        ),
        schema=schema,
    )


def _local_percentiles(spark, res, percentiles: list[float]) -> DataFrame:
    """Driver-side tail of wand_stats_percentiles_search: the same
    k-th-smallest rule (k = ceil(p*n), float product and ceil exactly
    as the Spark expressions compute them) over the bounded merged
    histogram — integer sums, exact."""
    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentiles must be in (0, 1], got {p}")
    schema = "pct double, value long"
    if res is None:
        return empty_df(spark, schema)
    hist: dict = {}
    for o, c in zip(res["ord"].to_numpy(), res["cnt"].to_numpy()):
        o = int(o)
        hist[o] = hist.get(o, 0) + int(c)
    if not hist:
        return empty_df(spark, schema)
    n = sum(hist.values())
    values = sorted(hist)
    cums = np.cumsum(np.array([hist[v] for v in values], np.int64))
    import math

    pcts = sorted(set(float(p) for p in percentiles))
    out_p, out_v = [], []
    for p in pcts:
        kth = math.ceil(n * p)
        idx = int(np.searchsorted(cums, kth, side="left"))
        if idx < len(values):
            out_p.append(p)
            out_v.append(np.int64(values[idx]))
    if not out_p:
        return empty_df(spark, schema)
    return spark.createDataFrame(
        pd.DataFrame({"pct": np.array(out_p, np.float64), "value": out_v}),
        schema=schema,
    )


def _local_group_topn(
    spark, res, gens, group_col: str, k_groups: int, group_limit: int
) -> DataFrame:
    """Driver-side tail of wand_group_search: member lists sorted by
    the (ns=-score, doc_id) struct order (Python tuple comparison IS
    Spark's struct comparison; scores kernel-rounded), groups ranked
    by head element, top k_groups exploded back to rows."""
    schema = (
        f"grp_rank int, {group_col} string, pos int, doc_id long, score double"
    )
    if res is None:
        return empty_df(spark, schema)
    dmap = _local_dict_map(gens, group_col)
    groups: dict = {}
    for g, o, d, s in zip(
        res["gen"].to_numpy(), res["ord"].to_numpy(),
        res["doc_id"].to_numpy(), res["score"].to_numpy(),
    ):
        v = dmap.get((int(g), int(o)))
        groups.setdefault(v, []).append((-float(s), int(d), float(s)))
    heads = []
    for v, members in groups.items():
        members.sort()
        del members[group_limit:]
        heads.append((members[0][0], members[0][1], v))
    heads.sort(key=lambda h: (h[0], h[1]))
    del heads[k_groups:]
    rows = {
        "grp_rank": [], group_col: [], "pos": [], "doc_id": [], "score": [],
    }
    for rank, (_, _, v) in enumerate(heads, start=1):
        for pos, (_, d, s) in enumerate(groups[v], start=1):
            rows["grp_rank"].append(np.int32(rank))
            rows[group_col].append(v)
            rows["pos"].append(np.int32(pos))
            rows["doc_id"].append(np.int64(d))
            rows["score"].append(s)
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def _apply_per_segment(
    unified,
    per_segment,
    schema: str,
    n_segments_hint: int | None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Run a per-segment Arrow kernel over the unified frame — one
    semantics, three physical strategies:

    - local tier (serving latency, r07): ``unified`` is a pandas frame
      (the byte-bounded pyarrow read, see _local_ok) — the same
      kernels run in-process per segment and the bounded result
      becomes a local relation; no scan stage, no exchange, no
      per-query Arrow worker round-trip.
    - exchange path (the 10^12-doc default): groupBy(seg).applyInPandas
      scores segments in parallel across executors; the shuffle moves
      only the term-pruned rows.
    - single-stage path: when the index holds few segments (known
      driver-side from the manifests) but the query is over the local
      tier's byte budget, coalesce(1) + mapInPandas groups in-process
      — the same kernels, no exchange, one scheduling wave instead of
      two. coalesce(1) and never coalesce(n): a segment's postings and
      doclen rows live in different FILES, so any n > 1 could split a
      segment across partitions and score it on partial inputs.
    """
    if isinstance(unified, pd.DataFrame):
        res = _kernel_pdf(unified, per_segment)
        spark = spark or SparkSession.getActiveSession()
        if res is None:
            return empty_df(spark, schema)
        # coalesce(1): createDataFrame slices even a 40-row local
        # relation across defaultParallelism partitions, turning the
        # downstream orderBy/limit into a 32-task job; one partition
        # makes the tail a single-task job (~3x faster, measured)
        return spark.createDataFrame(res, schema=schema).coalesce(1)
    if (
        not getattr(unified, "_spl_big_frame", False)
        and n_segments_hint is not None
        and 0 < n_segments_hint <= SINGLE_STAGE_MAX_SEGMENTS
    ):

        def all_segments(batches):
            parts = [p for p in batches if len(p)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            for _, g in pdf.groupby("seg", sort=False):
                out = per_segment(g.reset_index(drop=True))
                if len(out):
                    yield out

        return unified.coalesce(1).mapInPandas(all_segments, schema=schema)
    return unified.groupBy("seg").applyInPandas(per_segment, schema=schema)


def _decode_doclens(dl_data: bytes) -> np.ndarray:
    vals, _ = varint_decode(np.frombuffer(dl_data, dtype=np.uint8))
    return vals.astype(np.int64)


# ---------------------------------------------------------------------------
# deletions: per-segment tombstone streams (the Lucene liveDocs analogue)
# ---------------------------------------------------------------------------

# Sentinel written into dense streams (doclens / docvalues / ordinals)
# by compact_packed for slots whose doc was tombstoned: the compacted
# index carries no tombstone stream, so match-all / range / facet
# paths need a way to tell "deleted slot" from a real value. 2^48-1 is
# reserved — doc lengths and docvalues never legitimately reach it
# (documented contract; build_segments packs token counts and
# non-negative ints far below 2^48).
TOMBSTONE = np.int64((1 << 48) - 1)


def _encode_tombstones(ids: np.ndarray, doc_lo: int) -> bytes:
    """Sorted absolute doc ids -> delta varint stream (same codec as
    doclens; first value relative to doc_lo)."""
    rel = np.sort(np.unique(ids.astype(np.int64))) - doc_lo
    deltas = np.empty(len(rel), np.uint64)
    if len(rel):
        deltas[0] = np.uint64(rel[0])
        deltas[1:] = np.diff(rel).astype(np.uint64)
    return varint_encode(deltas).tobytes()


def _decode_tombstones(data: bytes, doc_lo: int) -> np.ndarray:
    """Delta varint stream -> sorted absolute doc ids."""
    vals, _ = varint_decode(np.frombuffer(data, dtype=np.uint8))
    if len(vals) == 0:
        return np.array([], np.int64)
    return doc_lo + np.cumsum(vals.astype(np.int64))


def _deletes_dir(path: str) -> str:
    return os.path.join(path, "deletes")


def _load_tombstones(path: str) -> dict[int, np.ndarray]:
    """seg -> sorted unique absolute deleted doc ids, read driver-side
    with pyarrow (no Spark job — tombstone streams are delete-by-id
    scale, the same bounded-driver-read contract as the termstats
    sidecar)."""
    d = _deletes_dir(path)
    if not os.path.isdir(d):
        return {}
    import pyarrow.dataset as ds

    tbl = ds.dataset(d, format="parquet").to_table(
        columns=["seg", "doc_lo", "dl_data"]
    )
    out: dict[int, list] = {}
    for seg, lo, blob in zip(
        tbl["seg"].to_pylist(), tbl["doc_lo"].to_pylist(), tbl["dl_data"].to_pylist()
    ):
        out.setdefault(int(seg), []).append(
            _decode_tombstones(bytes(blob), int(lo))
        )
    return {
        s: np.unique(np.concatenate(parts)) for s, parts in out.items()
    }


def delete_docs(path: str, doc_ids) -> dict:
    """Tombstone a bounded set of doc ids on a packed index — the
    delete-by-id the reference assumes beneath every handler (Solr's
    deleteById over Lucene liveDocs). Appends one sorted varint-delta
    tombstone stream per touched segment under deletes/ (append-only:
    repeated deletes union at read time); every packed query surface
    strips tombstoned docs at postings-decode time, and
    ``compact_packed`` physically drops them and clears the stream.

    Lucene stats semantics until compaction: n_docs, avgdl and df keep
    counting tombstoned docs (IndexReader.docFreq ignores liveDocs),
    so surviving docs' scores are unchanged — results equal the
    undeleted index's results with tombstoned ids removed.

    Driver-side pyarrow write + manifest append; no Spark job. Returns
    {"n_requested", "n_new", "tombstone_gen"}.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = _read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no packed index manifest under {path!r}")
    seg_size = int(m["seg_size"])
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return {"n_requested": 0, "n_new": 0, "tombstone_gen": m.get("tombstone_gen", 0)}
    if ids.min() < 0:
        raise ValueError(f"delete_docs: negative doc id ({ids.min()})")
    # no upper-bound check: a streamed generation's doc ids are an
    # OFFSET range (its n_docs is a count, not a bound), and a
    # tombstone for an id this generation doesn't hold strips nothing
    # at decode time — a harmless no-op, same as Lucene's
    # deleteDocuments(Term) matching nothing in a segment
    existing = _load_tombstones(path)
    gen = int(m.get("tombstone_gen", 0)) + 1
    segs, los, ns, blobs = [], [], [], []
    n_new = 0
    for seg in np.unique(ids // seg_size):
        seg = int(seg)
        doc_lo = seg * seg_size
        seg_ids = ids[(ids // seg_size) == seg]
        fresh = seg_ids[~np.isin(seg_ids, existing.get(seg, np.array([], np.int64)))]
        if len(fresh) == 0:
            continue
        n_new += len(fresh)
        segs.append(seg)
        los.append(doc_lo)
        ns.append(len(fresh))
        blobs.append(_encode_tombstones(fresh, doc_lo))
    if n_new:
        os.makedirs(_deletes_dir(path), exist_ok=True)
        tbl = pa.table(
            {
                "seg": pa.array(segs, pa.int32()),
                "doc_lo": pa.array(los, pa.int64()),
                "n": pa.array(ns, pa.int32()),
                "dl_data": pa.array(blobs, pa.binary()),
            }
        )
        pq.write_table(
            tbl, os.path.join(_deletes_dir(path), f"del-{gen:05d}.parquet")
        )
        m["tombstone_gen"] = gen
        m["has_deletes"] = True
        m.setdefault("lineage", []).append(
            {"op": "delete", "tombstone_gen": gen, "n_ids": int(n_new)}
        )
        _write_manifest(path, m)
    return {"n_requested": int(len(ids)), "n_new": int(n_new), "tombstone_gen": gen}


def live_docs(path: str) -> dict:
    """Deletion introspection: total/live/deleted doc counts and the
    per-segment tombstone tally — driver-side, no Spark job."""
    m = _read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no packed index manifest under {path!r}")
    tombs = _load_tombstones(path)
    n_del = sum(len(v) for v in tombs.values())
    return {
        "n_docs": int(m["n_docs"]),
        "n_deleted": int(n_del),
        "n_live": int(m["n_docs"]) - int(n_del),
        "per_segment": {int(s): int(len(v)) for s, v in sorted(tombs.items())},
    }


def delete_by_query(
    spark: SparkSession,
    path: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    field_segments: dict | None = None,
    max_ids: int = 1_000_000,
) -> dict:
    """Solr's deleteByQuery over the packed index: evaluate the parsed
    boolean query per segment (the same evaluator every packed search
    uses — Operand/And/Or/Not/Quote/FieldQuery/Range), collect the
    matching ids, and tombstone them via ``delete_docs``.

    Bounded-driver contract: the match set crosses the driver as ids
    (delete-by-id is the storage model), capped at ``max_ids`` —
    targeted purges (a user's docs, a date range, a poisoned source)
    are the use case, exactly Solr's. A delete that would tombstone a
    corpus-scale fraction should be a filtered rebuild instead; the
    cap raises rather than silently truncating.

    Idempotent: already-tombstoned docs never match (the evaluator
    strips them at decode time), so re-running deletes nothing new.
    """
    si = SegmentIndex.load(path)
    tree, field_ctx, unified = _prepare_boolean(
        spark, si, query, field_segments
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(pdf, tree, field_ctx, 1 << 40, k1, b)

    matches = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(si, *(field_segments or {}).values()), spark=spark,
    )
    rows = matches.select("doc_id").limit(max_ids + 1).collect()
    if len(rows) > max_ids:
        raise ValueError(
            f"delete_by_query matched more than max_ids={max_ids} docs — "
            "this is a corpus-scale delete; rebuild from a filtered "
            "corpus (or raise max_ids explicitly)"
        )
    return delete_docs(path, [r["doc_id"] for r in rows])


def _deleted_from_pdf(pdf: pd.DataFrame) -> np.ndarray:
    """Union of this segment's tombstone rows (_kind='del') — sorted
    absolute doc ids; empty when the index has no deletions. Per-field
    frames may stack duplicate del rows; np.unique dedups."""
    if "_kind" not in pdf.columns:
        return np.array([], np.int64)
    rows = pdf[pdf["_kind"] == "del"]
    if len(rows) == 0:
        return np.array([], np.int64)
    parts = [
        _decode_tombstones(r["data"], int(r["doc_lo"]))
        for _, r in rows.iterrows()
    ]
    return np.unique(np.concatenate(parts))


def _strip_deleted(
    docs: np.ndarray, deleted: np.ndarray, *aligned: np.ndarray
):
    """Drop tombstoned ids from a sorted-unique doc array plus any
    per-doc aligned arrays. The liveDocs check applied at decode time:
    removing docs only removes score mass, so block-max upper bounds
    stay valid and WAND pruning stays exact."""
    if deleted.size == 0 or docs.size == 0:
        return (docs, *aligned) if aligned else docs
    keep = ~np.isin(docs, deleted, assume_unique=True)
    if aligned:
        return (docs[keep], *(a[keep] for a in aligned))
    return docs[keep]


def _segment_topk_core(
    term_rows: list[dict],
    dls: np.ndarray,
    doc_lo: int,
    boosts: dict[str, float],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    chunk: int = 4,
    deleted: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Exact top-k for one segment: impact-ordered block-max scoring.

    DAAT-class pruning adapted to vectorized (Arrow batch) execution.
    Classic WAND moves per-doc pointers (PostingsEnum.advance,
    BinaryTermExistsValueSource.java:128-147); a python loop per doc
    would throw away vectorization, so this uses the score-at-a-time
    formulation over the same block-max skip data:

      phase 1 — decode blocks strictly in descending per-block upper
        bound (ub = boost*idf*tf_part(block_max_tf, dl_min)), chunked
        per term, until the k-th PARTIAL score strictly beats the sum
        of every term's best undecoded block ub. At that point no
        unseen doc can reach the top-k (its score is bounded by that
        sum), so a head term's long tf=1 tail never decodes.
      phase 2 — completion: candidates are accumulated docs whose
        partial + remaining bound reaches the k-th partial; for each
        term, decode only its undecoded blocks that contain a
        candidate (binary search on block_last — the advance() skip)
        and add their exact contributions. Scores of returned docs are
        exact, so ranking is identical to the flat path including the
        (score desc, doc_id asc) tie-break: any doc outside the
        candidate set is strictly below the k-th final score.

    Returns (doc_ids, scores, stats); stats counts decoded vs total
    blocks — the pruning effectiveness metric asserted by the
    skewed-tf fixture in tests/test_segments.py.
    """
    import heapq

    # TOMBSTONE slots (compacted-away deletions) are not real lengths
    nonzero = dls[(dls > 0) & (dls != TOMBSTONE)]
    dl_min = float(nonzero.min()) if len(nonzero) else 1.0
    norm_min = k1 * (1.0 - b + b * dl_min / avgdl)

    terms = []
    total_blocks = 0
    for r in term_rows:
        t = r["term"]
        bl = np.asarray(r["block_last"], dtype=np.int64)
        bo = np.asarray(r["block_off"], dtype=np.int64)
        bm = np.asarray(r["block_max"], dtype=np.float64)
        if len(bm) == 0:
            continue
        w = boosts[t] * idfs[t]
        ub = w * bm * (k1 + 1.0) / (bm + norm_min)
        order = np.argsort(-ub, kind="stable")  # impact order
        terms.append({
            "t": t, "data": r["data"], "bl": bl, "bo": bo,
            "df": int(r["df"]), "ub": ub, "order": order, "ptr": 0,
            "decoded": np.zeros(len(ub), dtype=bool),
        })
        total_blocks += len(ub)

    acc_docs = np.array([], dtype=np.int64)
    acc_scores = np.array([], dtype=np.float64)
    stats = {"blocks_decoded": 0, "blocks_total": total_blocks}
    if not terms:
        return acc_docs, acc_scores, stats

    def bm25(tfs: np.ndarray, docs: np.ndarray, t: str) -> np.ndarray:
        dl = dls[docs - doc_lo].astype(np.float64)
        tf = tfs.astype(np.float64)
        return (
            boosts[t] * idfs[t] * tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )

    def merge(docs: np.ndarray, scores: np.ndarray) -> None:
        nonlocal acc_docs, acc_scores
        all_docs = np.concatenate([acc_docs, docs])
        all_scores = np.concatenate([acc_scores, scores])
        uniq, inv = np.unique(all_docs, return_inverse=True)
        summed = np.zeros(len(uniq), np.float64)
        np.add.at(summed, inv, all_scores)
        acc_docs, acc_scores = uniq, summed

    def decode_marked(ti: dict, block_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ti["decoded"][block_ids] = True
        stats["blocks_decoded"] += len(block_ids)
        docs, tfs = decode_blocks(
            ti["data"], np.sort(block_ids), ti["bo"], ti["bl"], ti["df"]
        )
        if deleted is not None and deleted.size:
            # the liveDocs check at postings-decode time: tombstoned
            # docs never enter the accumulator, so theta reflects live
            # docs only; block upper bounds remain valid (dropping docs
            # only removes score mass) and pruning stays exact
            docs, tfs = _strip_deleted(docs, deleted, tfs)
        return docs, tfs

    # ---- phase 1: impact-ordered chunks until theta beats remaining
    heap = [(-ti["ub"][ti["order"][0]], i) for i, ti in enumerate(terms)]
    heapq.heapify(heap)
    while heap:
        theta = (
            np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
            if len(acc_scores) >= k
            else -np.inf
        )
        remaining = sum(
            ti["ub"][ti["order"][ti["ptr"]]]
            for ti in terms
            if ti["ptr"] < len(ti["order"])
        )
        if len(acc_scores) >= k and remaining < theta:
            break
        _, i = heapq.heappop(heap)
        ti = terms[i]
        take = ti["order"][ti["ptr"]: ti["ptr"] + chunk]
        ti["ptr"] += len(take)
        docs, tfs = decode_marked(ti, take)
        merge(docs, bm25(tfs, docs, ti["t"]))
        if ti["ptr"] < len(ti["order"]):
            heapq.heappush(heap, (-ti["ub"][ti["order"][ti["ptr"]]], i))

    # ---- phase 2: complete candidate scores from undecoded blocks
    theta = (
        np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
        if len(acc_scores) >= k
        else -np.inf
    )
    remaining = sum(
        ti["ub"][ti["order"][ti["ptr"]]]
        for ti in terms
        if ti["ptr"] < len(ti["order"])
    )
    if remaining > 0.0 and len(acc_docs):
        # per-doc remaining bound, tighter than the global sum: a term
        # can add at most the ub of the doc's OWN containing block, and
        # nothing at all if that block is already decoded (its
        # contribution is then exact in the accumulator).
        per_doc = np.zeros(len(acc_docs), np.float64)
        for ti in terms:
            blk = np.searchsorted(ti["bl"], acc_docs)
            valid = blk < len(ti["bl"])
            undecoded = valid.copy()
            undecoded[valid] = ~ti["decoded"][blk[valid]]
            per_doc[undecoded] += ti["ub"][blk[undecoded]]
        cand = acc_docs[acc_scores + per_doc >= theta]
        for ti in terms:
            if ti["ptr"] >= len(ti["order"]) or len(cand) == 0:
                continue
            need = np.unique(np.searchsorted(ti["bl"], cand))
            need = need[need < len(ti["bl"])]
            need = need[~ti["decoded"][need]]
            if len(need) == 0:
                continue
            docs, tfs = decode_marked(ti, need)
            mask = np.isin(docs, cand, assume_unique=True)
            docs, tfs = docs[mask], tfs[mask]
            if len(docs):
                merge(docs, bm25(tfs, docs, ti["t"]))

    return acc_docs, acc_scores, stats


def _segment_topk(
    pdf: pd.DataFrame,
    boosts: dict[str, float],
    idfs: dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> pd.DataFrame:
    """Exact top-k for one segment (see _segment_topk_core)."""
    dl_row = pdf[pdf["_kind"] == "dl"]
    posts = pdf[pdf["_kind"] == "post"]
    if len(dl_row) == 0 or len(posts) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    doc_lo = int(dl_row["doc_lo"].iloc[0])
    dls = _decode_doclens(dl_row["data"].iloc[0])
    term_rows = [
        {
            "term": r["term"], "data": r["data"], "df": r["df"],
            "block_last": r["block_last"], "block_max": r["block_max"],
            "block_off": r["block_off"],
        }
        for _, r in posts.iterrows()
    ]
    acc_docs, acc_scores, _ = _segment_topk_core(
        term_rows, dls, doc_lo, boosts, idfs, k, k1, b, avgdl,
        deleted=_deleted_from_pdf(pdf),
    )
    return _topk_frame(acc_docs, acc_scores, k)


def _sim_scores_np(sim, tf, dl, df, n, avgdl, payload=None):
    """Vectorized Similarity.score_expr (query/scorer.py) in numpy —
    identical formulas so packed-path results are rank-identical to
    the flat path for every similarity variant."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    if getattr(sim, "lossy_norm", False) and sim.kind != "classic":
        # same contract as Similarity.score_expr — the packed path
        # must not silently drop the flag the flat path rejects
        raise ValueError(
            "lossy_norm mirrors DefaultSimilarity's byte315 norm "
            "byte — classic kind only (BM25 keeps exact norms)"
        )
    if sim.kind == "bm25":
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5)) if sim.use_idf else 1.0
        if sim.use_tf:
            if sim.use_norm:
                tfp = tf * (sim.k1 + 1.0) / (
                    tf + sim.k1 * (1.0 - sim.b + sim.b * dl / avgdl)
                )
            else:
                tfp = tf * (sim.k1 + 1.0) / (tf + sim.k1)
        else:
            tfp = (tf > 0).astype(np.float64)
        s = idf * tfp
    else:
        idf = np.log(n / (df + 1.0)) + 1.0 if sim.use_idf else 1.0
        tfp = np.sqrt(tf) if sim.use_tf else (tf > 0).astype(np.float64)
        if sim.use_norm:
            norm = 1.0 / np.sqrt(dl)
            if getattr(sim, "lossy_norm", False):
                # byte315 round-trip (query/scorer.byte315_table):
                # float32-round then largest representable <= x
                from ..query.scorer import _BYTE315

                tbl = np.asarray(_BYTE315)
                x = norm.astype(np.float32).astype(np.float64)
                idx = np.searchsorted(tbl, x, side="right")
                norm = tbl[np.maximum(idx, 1) - 1]
        else:
            norm = 1.0
        s = tfp * idf * norm
    if sim.use_payload and payload is not None:
        s = s * payload
    return s


def _topk_frame(acc_docs: np.ndarray, acc_scores: np.ndarray, k: int) -> pd.DataFrame:
    """Deterministic per-segment top-k: full (score desc, doc asc)
    lexsort, NOT argpartition — among tied scores (e.g. the score-0
    complement of a NOT query) the k chosen must be the lowest doc ids
    or the global merge diverges from the flat path's tie-break."""
    if len(acc_docs) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    top = min(k, len(acc_docs))
    order = np.lexsort((acc_docs, -np.round(acc_scores, 12)))[:top]
    return pd.DataFrame({"doc_id": acc_docs[order], "score": acc_scores[order]})


def _segment_topk_sim(
    pdf: pd.DataFrame,
    boosts: dict[str, float],
    dfs: dict[str, int],
    k: int,
    sim,
    n: int,
    avgdl: float,
    min_should_match: int = 1,
    boost_fn_spec: tuple | None = None,
    after: tuple[float, int, int] | None = None,
) -> pd.DataFrame:
    """Exact per-segment top-k for an arbitrary Similarity (payload /
    classic / toggle variants) — decodes the full posting (+ payload
    sub-stream when the similarity uses it) per query term. The
    block-max pruned path stays specialized to BM25; these variants
    are exact by construction.

    ``after``: (score, doc_id, round_to) searchAfter cursor — docs at
    or before the cursor in (rounded-score desc, doc_id asc) order
    are dropped BEFORE the per-segment truncation, so page N+1's
    candidates are never lost to page N's top-k cut. Applied to the
    FINAL score (post boost_fn), the order the client paginates in.

    ``boost_fn_spec``: (value_col, fn) — BoostedQuery's multiplicative
    ValueSource (MoreLikeThisHelper.java:131-145): fn is a vectorized
    np.ndarray -> np.ndarray over the per-doc values of ``value_col``
    ("doc_id" = the intrinsic key; any other name reads the segment's
    packed docvalues stream), multiplied into every candidate's score
    BEFORE top-k — the boost decides which docs make the k.

    ``min_should_match``: docs matching fewer than mm DISTINCT query
    terms are dropped BEFORE top-k (BooleanQuery.setMinimumNumber
    ShouldMatch; MoreLikeThis.java:147's configurable mm). Match
    counts are segment-local facts (a doc's postings for every term
    live in its doc-range segment), so the per-segment filter + global
    k-row merge stays exact — the same argument as scoring."""
    dl_row = pdf[pdf["_kind"] == "dl"]
    posts = pdf[pdf["_kind"] == "post"]
    if len(dl_row) == 0 or len(posts) == 0:
        return _topk_frame(np.array([], np.int64), np.array([], np.float64), k)
    doc_lo = int(dl_row["doc_lo"].iloc[0])
    dls = _decode_doclens(dl_row["data"].iloc[0])
    deleted = _deleted_from_pdf(pdf)

    acc_docs = np.array([], dtype=np.int64)
    acc_scores = np.array([], dtype=np.float64)
    acc_counts = np.array([], dtype=np.int64)
    for _, row in posts.iterrows():
        t = row["term"]
        docs, tfs = decode_postings(row["data"])
        payload = None
        if sim.use_payload:
            if row["pay_data"] is None:
                # match the phrase path's fail-fast ('packed index lacks
                # positions') rather than silently dropping the payload
                # factor and diverging from the flat path
                raise ValueError(
                    "packed index lacks payloads (built without the "
                    f"payload sub-stream) — cannot score term '{t}' with "
                    "a payload similarity"
                )
            payload = decode_payloads(row["pay_data"])
        if deleted.size:
            if payload is not None:
                docs, tfs, payload = _strip_deleted(docs, deleted, tfs, payload)
            else:
                docs, tfs = _strip_deleted(docs, deleted, tfs)
            if len(docs) == 0:
                continue
        scores = boosts[t] * _sim_scores_np(
            sim, tfs, dls[docs - doc_lo], float(dfs[t]), float(n), avgdl,
            payload=payload,
        )
        all_docs = np.concatenate([acc_docs, docs])
        all_scores = np.concatenate([acc_scores, scores])
        # one posting row per distinct term, so each occurrence adds
        # exactly 1 to the doc's matched-clause count
        all_counts = np.concatenate(
            [acc_counts, np.ones(len(docs), dtype=np.int64)]
        )
        uniq, inv = np.unique(all_docs, return_inverse=True)
        summed = np.zeros(len(uniq), np.float64)
        np.add.at(summed, inv, all_scores)
        counted = np.zeros(len(uniq), np.int64)
        np.add.at(counted, inv, all_counts)
        acc_docs, acc_scores, acc_counts = uniq, summed, counted
    if min_should_match > 1:
        keep = acc_counts >= min_should_match
        acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
    if boost_fn_spec is not None and len(acc_docs):
        value_col, fn = boost_fn_spec
        if value_col == "doc_id":
            vals = acc_docs.astype(np.float64)
        else:
            dv_rows = pdf[(pdf["_kind"] == "dv") & (pdf["term"] == value_col)]
            if len(dv_rows) == 0:
                raise ValueError(
                    f"segment frame lacks the {value_col!r} docvalues "
                    "stream for boost_fn"
                )
            arr = _decode_doclens(dv_rows["data"].iloc[0])
            lo = int(dv_rows["doc_lo"].iloc[0])
            # tombstoned docs were stripped from the postings above,
            # so every remaining candidate holds a real value
            vals = arr[acc_docs - lo].astype(np.float64)
        boost = np.asarray(fn(vals), np.float64)
        if boost.shape != acc_scores.shape:
            raise ValueError(
                "boost_fn must map an (n,) value array to an (n,) "
                f"boost array; got {boost.shape} for {acc_scores.shape}"
            )
        acc_scores = acc_scores * boost
    if after is not None and len(acc_docs):
        s_a, d_a, rt = after
        keep = _cursor_keep(acc_scores, acc_docs, s_a, d_a, rt)
        acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
    return _topk_frame(acc_docs, acc_scores, k)


def _spark_round(scores: np.ndarray, rt: int) -> np.ndarray:
    """Vectorized Spark-compatible rounding: HALF_UP on the shortest
    decimal repr (java BigDecimal.valueOf(double)) — bit-for-bit what
    F.round serves on the flat tier and what the shared DuckDB oracles
    compute.

    np.round (binary half-even on the scaled binary value) agrees with
    that everywhere except within ~one repr-ULP of a .5 quantum
    boundary; only that band pays the exact per-element Decimal path,
    so the fast path stays fully vectorized. Shared by the packed
    collapse/group winner selection and the boost_fn base rounding so
    packed winner order matches the flat/Spark rounding exactly
    (a .xxxx5-boundary score must not flip a group winner between
    collapse_search and wand_collapse_search)."""
    rs = np.round(scores, rt)
    scaled = scores * (10.0**rt)
    frac = scaled - np.floor(scaled)
    # the band must scale with the value: the repr-vs-binary offset of
    # a .5-quantum boundary is a few ULPs OF THE SCALED VALUE, so a
    # fixed 1e-6 misses boundary cases once |scaled| > ~5e9 (boosted
    # scores times large docvalues). Once the scaled ULP reaches ~0.1
    # the fractional detection itself loses resolution, and 4*ulp
    # covers the whole [0,1) frac range — i.e. every such (rare,
    # pathological-magnitude) value takes the exact Decimal path.
    sp = np.spacing(np.abs(scaled))
    band = np.abs(frac - 0.5) <= np.maximum(1e-6, 4.0 * sp)
    if band.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-rt)
        rs[band] = np.array(
            [
                float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
                for v in scores[band]
            ],
            np.float64,
        )
    return rs


def _cursor_keep(
    scores: np.ndarray, docs: np.ndarray, s_a: float, d_a: int, rt: int
) -> np.ndarray:
    """searchAfter keep-mask: True where (round(score, rt), doc) sits
    strictly after the cursor in (score desc, doc asc) order — under
    the SAME rounding the client's cursor was produced with.

    np.round is binary half-even; the cursor holds Spark F.round
    values (HALF_UP on the shortest decimal repr,
    java.math.BigDecimal.valueOf). For a double within one quantum of
    the cursor the two roundings can disagree, which would drop a
    page-2 doc (or let a page-1 doc burn a top-k slot) BEFORE the
    per-segment truncation — so docs in that band get the exact Spark
    rounding via decimal (repr(float) is the same shortest round-trip
    repr Double.toString produces). The band is at most the
    cursor-score tie group; everything outside it rounds to the same
    side under both schemes (the two roundings of one double differ
    by at most one quantum). Property-tested against a pure-Decimal
    reference in tests/test_cursor.py. Rounding now delegated to the
    shared _spark_round (exact HALF_UP everywhere, not just in the
    cursor band — strictly stronger than the original band fix)."""
    rs = _spark_round(scores, rt)
    return (rs < s_a) | ((rs == s_a) & (docs > d_a))


def _sloppy_chain_docs(
    slot_data: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    doc_lo: int,
    slop: int,
    cand_docs: np.ndarray | None = None,
) -> np.ndarray:
    """LOCAL doc ids holding an in-order occurrence chain of the
    phrase slots whose window holds at most ``slop`` extra positions
    (p_last - p_0 - (n-1) <= slop) — ordered SpanNearQuery semantics.

    ``slot_data``: per-slot (docs, tfs, positions) in PHRASE order;
    ``docs`` are global ids, ``positions`` flat-aligned to
    repeat(docs, tfs). Docs ascend and positions ascend within a doc,
    so the composed (local_doc, pos) int64 keys are sorted and every
    extension step is one vectorized searchsorted. Each occurrence of
    slot 0 seeds one candidate chain; every step extends each chain to
    the FIRST next-slot position past its current end — greedy-minimal
    extension is exact (for a fixed start, the minimal reachable end
    minimizes the final window), and chains already past the slop
    budget are pruned, so the live set only shrinks. ``cand_docs``
    (global ids) optionally pre-filters the seeds."""
    M = np.int64(1) << np.int64(32)
    keys = []
    for docs, tfs, pos in slot_data:
        if len(docs) == 0:
            return np.array([], np.int64)
        k = np.repeat(docs.astype(np.int64) - doc_lo, tfs) * M + pos.astype(
            np.int64
        )
        keys.append(k)
    cur = keys[0]
    if cand_docs is not None:
        cur = cur[np.isin(cur // M, cand_docs.astype(np.int64) - doc_lo)]
    starts = cur
    for j in range(1, len(keys)):
        kj = keys[j]
        idx = np.searchsorted(kj, cur + 1)
        ok = idx < len(kj)
        nxt = kj[np.minimum(idx, len(kj) - 1)]
        ok &= (nxt // M) == (cur // M)
        ok &= (nxt % M) - (starts % M) - j <= slop
        cur, starts = nxt[ok], starts[ok]
        if cur.size == 0:
            return np.array([], np.int64)
    return np.unique(starts // M)


def _segment_phrase_topk(
    pdf: pd.DataFrame,
    phrase: list[str],
    dfs: dict[str, int],
    k: int,
    k1: float,
    b: float,
    n: int,
    avgdl: float,
    slop: int = 0,
) -> pd.DataFrame:
    """Per-segment exact phrase match + member-term BM25 scoring.

    Adjacency via position-set intersection: encode (local_doc, pos-i)
    as a single int64 key per phrase slot i; a doc contains the phrase
    iff the key intersection over all slots is non-empty — the
    PhraseQuery/SpanNearQuery mechanism (RecursiveDescentParser
    .java:90-107 quoted semantics) vectorized over the whole segment.
    Scores match the flat compiler._phrase: sum of member-term BM25
    partials (query/compiler.py)."""
    from .codec import BLOCK, decode_block_positions

    dl_row = pdf[pdf["_kind"] == "dl"]
    posts = pdf[pdf["_kind"] == "post"]
    empty = _topk_frame(np.array([], np.int64), np.array([], np.float64), k)
    if len(dl_row) == 0 or len(posts) == 0:
        return empty
    doc_lo = int(dl_row["doc_lo"].iloc[0])
    dls = _decode_doclens(dl_row["data"].iloc[0])

    rows: dict[str, object] = {}
    for _, row in posts.iterrows():
        if row["pos_data"] is None:
            raise ValueError("packed index lacks positions (codec<3 build)")
        rows[row["term"]] = row
    if any(t not in rows for t in phrase):
        return empty

    # process slots rarest-term-first: the first term decodes fully and
    # fixes the candidate docs; every later term decodes ONLY the
    # blocks that can hold a candidate (block_last searchsorted +
    # per-block position decode) — a phrase containing a head term
    # never pays the head term's full decode (the skip-data shape of
    # BinaryTermExistsValueSource.java:128-147 applied to positions)
    M = np.int64(1) << np.int64(32)  # local doc ids < seg_size << 2^32
    slots = sorted(range(len(phrase)), key=lambda i: (dfs[phrase[i]], phrase[i]))
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    keys = None
    cand_docs: np.ndarray | None = None
    for slot in slots:
        t = phrase[slot]
        if t in decoded:
            docs, tfs, pos = decoded[t]
        elif cand_docs is None:
            row = rows[t]
            docs, tfs = decode_postings(row["data"])
            pos = decode_positions(row["pos_data"], tfs)
            decoded[t] = (docs, tfs, pos)
        else:
            row = rows[t]
            block_last = np.asarray(row["block_last"], dtype=np.int64)
            need = np.unique(np.searchsorted(block_last, cand_docs))
            need = need[need < len(block_last)]
            if len(need) == 0:
                return empty
            n_total = int(row["df"])
            docs, tfs = decode_blocks(
                row["data"], need,
                np.asarray(row["block_off"], dtype=np.int64),
                block_last, n_total,
            )
            counts = [min(BLOCK, n_total - int(i) * BLOCK) for i in need]
            bounds = np.cumsum([0] + counts)
            tfs_by_block = [
                tfs[bounds[j]:bounds[j + 1]] for j in range(len(need))
            ]
            pos = decode_block_positions(
                row["pos_data"], need,
                np.asarray(row["pos_off"], dtype=np.int64), tfs_by_block,
            )
            decoded[t] = (docs, tfs, pos)
        if slop == 0:
            k_i = np.repeat(docs - doc_lo, tfs) * M + (pos - slot)
            keys = k_i if keys is None else np.intersect1d(
                keys, k_i, assume_unique=True
            )
            if keys.size == 0:
                return empty
            cand_docs = np.unique(keys // M) + doc_lo
        else:
            # sloppy phrase: the position-shift key intersection only
            # encodes EXACT adjacency, so candidates narrow at the doc
            # level (must hold every term); the window test runs on the
            # survivors below. Block-skip decode still applies — later
            # terms decode only candidate-covering blocks, and
            # intersecting with a partial decode is exact because every
            # candidate lies inside the decoded blocks.
            cand_docs = docs if cand_docs is None else np.intersect1d(
                cand_docs, docs, assume_unique=True
            )
            if cand_docs.size == 0:
                return empty
    # liveDocs: tombstoned docs leave the hit set before scoring (the
    # phrase path is exact — no pruning depends on the dropped docs)
    hit_docs = _strip_deleted(cand_docs, _deleted_from_pdf(pdf))
    if hit_docs.size == 0:
        return empty
    if slop > 0:
        local = _sloppy_chain_docs(
            [decoded[t] for t in phrase], doc_lo, slop, hit_docs
        )
        if local.size == 0:
            return empty
        hit_docs = local + doc_lo
    hit_local = hit_docs - doc_lo

    # member-term BM25 over the phrase docs (distinct terms, boost 1);
    # every term's decoded subset covers the hits (hits shrink
    # monotonically after each term's decode)
    scores = np.zeros(hit_docs.size, np.float64)
    dl_hit = dls[hit_local].astype(np.float64)
    for t in sorted(set(phrase)):
        docs, tfs, _ = decoded[t]
        mask = np.isin(docs, hit_docs, assume_unique=True)
        d, tf = docs[mask], tfs[mask].astype(np.float64)
        idx = np.searchsorted(hit_docs, d)
        idf = float(np.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)))
        scores[idx] += idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl_hit[idx] / avgdl)
        )
    return _topk_frame(hit_docs, scores, k)


def wand_phrase_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    phrase_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    slop: int = 0,
) -> DataFrame:
    """Quoted-phrase top-k over packed v3 segments (positions
    sub-stream): per-segment position-intersection + member-term BM25,
    k rows per segment merged globally. Rank-identical to the flat
    positional path (tests/test_segments_v3.py). ``slop > 0`` relaxes
    exact adjacency to ordered span-near (`"a b"~n`): doc-level
    candidate narrowing keeps the rarest-first block-skip decode, then
    the in-order chain window test runs on the survivors
    (_sloppy_chain_docs)."""
    term_list = sorted(set(phrase_terms))
    stats = _sidecar_stats(seg_index.path, term_list)
    if stats is None:
        raise ValueError("phrase search needs the termstats sidecar (codec v3)")
    dfs = {t: d for t, (d, _c) in stats.items()}
    if any(dfs.get(t, 0) == 0 for t in term_list):
        return empty_df(spark, "doc_id long, score double")
    est = _local_estimate(
        [(seg_index, term_list)], with_subs=True, stats_list=[stats]
    )
    budget = _local_tier_budget()
    local = 0 < budget and est is not None and est <= budget
    unified = _unified_frame(
        spark, [(0, seg_index)], term_list, with_subs=True, local=local
    )
    if not local and est is not None and est > SINGLE_STAGE_MAX_BYTES:
        unified._spl_big_frame = True
    n, avgdl = seg_index.n_docs, seg_index.avgdl

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_phrase_topk(
            pdf, list(phrase_terms), dfs, k, k1, b, n, avgdl, slop=slop
        )

    if isinstance(unified, pd.DataFrame):
        return _local_topk_frame(
            spark, _kernel_pdf(unified, per_segment), k, round_to
        )
    seg_tops = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(seg_index), spark=spark,
    )
    return (
        seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _segment_boolean_topk(
    pdf: pd.DataFrame,
    tree,
    field_ctx: dict[str, dict],
    k: int,
    k1: float,
    b: float,
    facet_ord_col: str | None = None,
    boost_terms: list[tuple[str, float]] | None = None,
    boost_fn_spec: tuple | None = None,
    collapse_ord_col: str | None = None,
    round_to: int = 5,
    only_doc_ids: np.ndarray | None = None,
    facet_range_spec: tuple | None = None,
    stats_col: str | None = None,
    collapse_limit: int = 1,
    count_trees: list | None = None,
    stats_facet_spec: tuple | None = None,
    hist_col: str | None = None,
) -> pd.DataFrame:
    """Per-segment boolean-tree evaluation over decoded postings.

    Boolean algebra (Or=union-sum, And=intersection-sum, Not=
    complement) is doc-LOCAL, and segments partition docs by range, so
    evaluating the tree independently per segment and merging top-k is
    exact — the same argument that makes WAND's per-segment fan-out
    correct. Leaves score BM25 from the decoded postings; node ops are
    numpy set algebra on (sorted docs, scores) pairs.

    ``field_ctx`` maps field name -> {"idfs", "avgdl"} ("" = default
    field); rows in ``pdf`` carry a matching ``fld`` tag. FieldQuery
    nodes switch the scoring context to that field's postings/doclens/
    stats (the per-field index routing of the flat QueryCompiler,
    segment-local because all per-field indexes share the doc space).
    Range nodes evaluate over the intrinsic doc_id key (constant score
    1.0, the ConstantScoreRangeQuery semantic); stored-column ranges
    need the flat path's corpus.
    """
    from ..query import ast as qast

    empty = _topk_frame(np.array([], np.int64), np.array([], np.float64), k)
    dls_by_field: dict[str, np.ndarray] = {}
    doc_lo_by_field: dict[str, int] = {}
    for _, r in pdf[pdf["_kind"] == "dl"].iterrows():
        f = r["fld"] if "fld" in pdf.columns else ""
        dls_by_field[f] = _decode_doclens(r["data"])
        doc_lo_by_field[f] = int(r["doc_lo"])
    if "" not in dls_by_field:
        if (
            facet_ord_col is not None
            or facet_range_spec is not None
            or hist_col is not None
        ):
            return _empty_facet()
        if collapse_ord_col is not None:
            return _empty_collapse()
        if stats_col is not None:
            return _empty_stats()
        if stats_facet_spec is not None:
            return _empty_stats_facet()
        if count_trees is not None:
            # every name still gets a row so zero-count facet queries
            # survive the cross-segment sum (Solr serves 0 counts)
            return pd.DataFrame(
                {
                    "name": [nm for nm, _ in count_trees],
                    "cnt": np.zeros(len(count_trees), np.int64),
                }
            )
        return empty
    doc_lo = doc_lo_by_field[""]
    dls = dls_by_field[""]
    # dl=0 docs never match (no tokens); TOMBSTONE slots are
    # compacted-away deletions — neither belongs in the match-all set
    all_docs = doc_lo + np.flatnonzero(
        (dls > 0) & (dls != TOMBSTONE)
    ).astype(np.int64)
    deleted = _deleted_from_pdf(pdf)

    dvs: dict[str, np.ndarray] = {}
    dv_lo: dict[str, int] = {}
    for _, r in pdf[pdf["_kind"] == "dv"].iterrows():
        dvs[r["term"]] = _decode_doclens(r["data"])
        dv_lo[r["term"]] = int(r["doc_lo"])

    posts = pdf[pdf["_kind"] == "post"]
    has_pos = "pos_data" in posts.columns
    decoded: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
    positions: dict[tuple[str, str], np.ndarray] = {}
    for idx, r in posts.iterrows():
        f = r["fld"] if "fld" in pdf.columns else ""
        docs_tfs = decode_postings(r["data"])
        decoded[(f, r["term"])] = docs_tfs
        if has_pos and r["pos_data"] is not None:
            positions[(f, r["term"])] = decode_positions(r["pos_data"], docs_tfs[1])

    def bm25(term: str, fld: str) -> tuple[np.ndarray, np.ndarray]:
        ctx = field_ctx.get(fld, field_ctx[""])
        idfs, avgdl = ctx["idfs"], ctx["avgdl"]
        # per-field k1/b (SchemaSimilarityFactory overrides); fall back
        # to the query-level globals
        fk1 = ctx.get("k1", k1)
        fb = ctx.get("b", b)
        fdls = dls_by_field.get(fld, dls)
        f_lo = doc_lo_by_field.get(fld, doc_lo)
        if (fld, term) not in decoded or term not in idfs:
            return np.array([], np.int64), np.array([], np.float64)
        docs, tfs = decoded[(fld, term)]
        tf = tfs.astype(np.float64)
        dl = fdls[docs - f_lo].astype(np.float64)
        s = idfs[term] * tf * (fk1 + 1.0) / (
            tf + fk1 * (1.0 - fb + fb * dl / avgdl)
        )
        return docs, s

    def union_sum(l, r):
        docs = np.concatenate([l[0], r[0]])
        scores = np.concatenate([l[1], r[1]])
        uniq, inv = np.unique(docs, return_inverse=True)
        summed = np.zeros(len(uniq), np.float64)
        np.add.at(summed, inv, scores)
        return uniq, summed

    def range_eval(field: str, node) -> tuple[np.ndarray, np.ndarray]:
        """Constant-score 1.0 range docset (the flat compiler's
        _range semantic): intrinsic doc_id key, or any numeric column
        packed as a docvalues stream (build_segments value_cols)."""

        def _num(v: str) -> float:
            try:
                return float(int(v))
            except ValueError:
                return float(v)

        if field != "doc_id":
            if field not in dvs:
                raise ValueError(
                    f"packed range over {field!r} needs a docvalues "
                    "stream — rebuild with build_segments(..., "
                    f"value_cols=[{field!r}]) (doc_id ranges are "
                    "intrinsic)"
                )
            vals = dvs[field]
            v_lo = dv_lo[field]
            # TOMBSTONE slots (compacted deletions) match no range
            mask = vals != TOMBSTONE
            if node.low is not None:
                lo_v = _num(node.low)
                mask &= (vals >= lo_v) if node.include_low else (vals > lo_v)
            if node.high is not None:
                hi_v = _num(node.high)
                mask &= (vals <= hi_v) if node.include_high else (vals < hi_v)
            docs = v_lo + np.flatnonzero(mask).astype(np.int64)
            return docs, np.ones(len(docs), np.float64)

        lo_edge = float(doc_lo)
        hi_edge = float(doc_lo + len(dls) - 1)
        lo = lo_edge if node.low is None else _num(node.low)
        hi = hi_edge if node.high is None else _num(node.high)
        if node.low is not None and not node.include_low:
            lo = np.floor(lo) + 1.0
        if node.high is not None and not node.include_high:
            hi = np.ceil(hi) - 1.0
        lo = int(max(lo_edge, np.ceil(lo)))
        hi = int(min(hi_edge, np.floor(hi)))
        if hi < lo:
            return np.array([], np.int64), np.array([], np.float64)
        docs = np.arange(lo, hi + 1, dtype=np.int64)
        # compacted deletions hold TOMBSTONE in the doclen stream —
        # a doc_id range must not resurrect them (dl=0 docs DO match:
        # empty docs exist in the doc space)
        docs = docs[dls[docs - doc_lo] != TOMBSTONE]
        return docs, np.ones(len(docs), np.float64)

    def evaluate(node, fld: str = ""):
        from ..analysis.tokenizer import tokenize_pandas

        if isinstance(node, qast.Operand):
            if node.value == "*:*":
                return all_docs, np.zeros(len(all_docs), np.float64)
            toks = sorted(set(tokenize_pandas(pd.Series([node.value]))[0]))
            acc = (np.array([], np.int64), np.array([], np.float64))
            for t in toks:
                acc = union_sum(acc, bm25(t, fld))
            return acc
        if isinstance(node, qast.Or):
            return union_sum(evaluate(node.left, fld), evaluate(node.right, fld))
        if isinstance(node, qast.And):
            if isinstance(node.right, qast.Not):
                ld, ls = evaluate(node.left, fld)
                rd, _ = evaluate(node.right.child, fld)
                keep = ~np.isin(ld, rd, assume_unique=True)
                return ld[keep], ls[keep]
            if isinstance(node.left, qast.Not):
                rd, rs = evaluate(node.right, fld)
                ld, _ = evaluate(node.left.child, fld)
                keep = ~np.isin(rd, ld, assume_unique=True)
                return rd[keep], rs[keep]
            ld, ls = evaluate(node.left, fld)
            rd, rs = evaluate(node.right, fld)
            both = np.intersect1d(ld, rd, assume_unique=True)
            return both, (
                ls[np.searchsorted(ld, both)] + rs[np.searchsorted(rd, both)]
            )
        if isinstance(node, qast.Not):
            md, _ = evaluate(node.child, fld)
            keep = ~np.isin(all_docs, md, assume_unique=True)
            docs = all_docs[keep]
            return docs, np.zeros(len(docs), np.float64)
        if isinstance(node, qast.Range):
            return range_eval("doc_id", node)
        if isinstance(node, qast.FieldQuery):
            fname = node.field.rstrip(":")
            if isinstance(node.child, qast.Range):
                return range_eval(fname, node.child)
            if fname not in field_ctx:
                raise ValueError(
                    f"no packed index for field {fname!r} — pass it via "
                    "field_segments (build_segments over that field's "
                    "flat index; same doc space and seg_size)"
                )
            return evaluate(node.child, fname)
        if isinstance(node, qast.Quote):
            phrase = list(tokenize_pandas(pd.Series([node.child.evaluate()]))[0])
            f_lo = doc_lo_by_field.get(fld, doc_lo)
            # distinguish "term has no postings here" (empty match, fine)
            # from "postings exist but the positions sub-stream doesn't"
            # (index built without positions — raise like the phrase
            # path, never silently return empty)
            for t in phrase:
                if (fld, t) in decoded and (fld, t) not in positions:
                    raise ValueError(
                        f"packed index for field {fld or 'default'!r} "
                        "lacks positions (codec<3 build) — phrase "
                        "queries need build_index(positions=True)"
                    )
            if not phrase or any((fld, t) not in positions for t in phrase):
                return np.array([], np.int64), np.array([], np.float64)
            slop_q = getattr(node, "slop", 0)
            if slop_q > 0:
                # `"a b"~n` ordered span-near: in-order chain window
                # test over the already-decoded positions
                local = _sloppy_chain_docs(
                    [
                        (*decoded[(fld, t)], positions[(fld, t)])
                        for t in phrase
                    ],
                    f_lo,
                    slop_q,
                )
                if local.size == 0:
                    return np.array([], np.int64), np.array([], np.float64)
                hits = local + f_lo
            else:
                M = np.int64(1) << np.int64(32)
                keys = None
                for i, t in enumerate(phrase):
                    docs, tfs = decoded[(fld, t)]
                    doc_per_pos = np.repeat(docs - f_lo, tfs)
                    k_i = doc_per_pos * M + (positions[(fld, t)] - i)
                    keys = k_i if keys is None else np.intersect1d(keys, k_i)
                    if keys.size == 0:
                        return np.array([], np.int64), np.array([], np.float64)
                hits = np.unique(keys // M) + f_lo
            # flat compiler semantics: member-term BM25 summed on hits
            acc = (hits, np.zeros(len(hits), np.float64))
            for t in sorted(set(phrase)):
                d, s = bm25(t, fld)
                mask = np.isin(d, hits, assume_unique=True)
                idx = np.searchsorted(acc[0], d[mask])
                acc[1][idx] += s[mask]
            return acc
        raise ValueError(
            f"packed boolean path supports Operand/And/Or/Not/Quote/"
            f"FieldQuery/Range; got {type(node).__name__}"
        )

    docs, scores = evaluate(tree)
    # liveDocs: the tree's algebra is doc-local, so one strip of the
    # final match set (before boosting / faceting / top-k) is exact —
    # a tombstoned doc contributes nothing to any OTHER doc's score
    if deleted.size and len(docs):
        docs, scores = _strip_deleted(docs, deleted, scores)
    if count_trees is not None:
        # facet.query: |main docset ∩ fq docset| per named subquery.
        # The main docset is already tombstone-stripped, so the
        # intersection never resurrects a deleted doc. One row per
        # name ALWAYS (zero counts included — Solr serves them).
        names, cnts = [], []
        for nm, fq_tree in count_trees:
            fd, _ = evaluate(fq_tree)
            names.append(nm)
            cnts.append(np.intersect1d(docs, fd, assume_unique=True).size)
        return pd.DataFrame({"name": names, "cnt": np.asarray(cnts, np.int64)})
    if only_doc_ids is not None and len(docs):
        # second-pass scoring for a bounded candidate page (ReRank):
        # keep only the allowlisted docs and return ALL of them — the
        # caller owns ranking; the per-segment output is at most
        # |allowlist| rows
        keep = np.isin(docs, only_doc_ids, assume_unique=True)
        docs, scores = docs[keep], scores[keep]
        k = len(only_doc_ids)
    # boosted SHOULD clauses over the tree's match docset — the
    # feedback final query (seed MUST + expansion SHOULD,
    # UnsupervisedFeedbackHelper.java:110-118): candidates stay the
    # tree's matches; each expansion term adds boost*BM25 where it
    # co-occurs. Doc-local, so per-segment evaluation stays exact.
    if boost_terms and len(docs):
        for t, bst in boost_terms:
            d, s = bm25(t, "")
            mask = np.isin(d, docs, assume_unique=True)
            if mask.any():
                idx = np.searchsorted(docs, d[mask])
                scores[idx] += bst * s[mask]
    if boost_fn_spec is not None and len(docs):
        # BoostedQuery's multiplicative ValueSource (MoreLikeThisHelper
        # .java:131-145) — applied BEFORE top-k so the boost decides
        # which docs make the k; values from the intrinsic doc_id or
        # the segment's packed docvalues stream
        bcol, bfn = boost_fn_spec
        if bcol == "doc_id":
            vals = docs.astype(np.float64)
        else:
            if bcol not in dvs:
                raise ValueError(
                    f"segment frame lacks the {bcol!r} docvalues stream "
                    "for boost_fn"
                )
            vals = dvs[bcol][docs - dv_lo[bcol]].astype(np.float64)
        # flat twin parity: the flat boolean surfaces hand
        # _apply_boost_fn a 5-decimal-rounded base score
        # (unsupervised_feedback / execute_query round their output
        # with F.round = decimal HALF_UP), so the multiplier applies
        # to the identically-rounded base here too
        scores = _spark_round(scores, 5) * np.asarray(bfn(vals), np.float64)
    if facet_ord_col is not None:
        if len(docs) == 0 or facet_ord_col not in dvs:
            return _empty_facet()
        ords_arr = dvs[facet_ord_col]
        f_lo = dv_lo[facet_ord_col]
        ids = docs - f_lo
        valid = (ids >= 0) & (ids < len(ords_arr))
        hit_ords = ords_arr[ids[valid]].astype(np.int64)
        # guard: a TOMBSTONE ordinal (compacted deletion) must never
        # reach bincount — it would allocate a 2^48-slot array
        hit_ords = hit_ords[hit_ords != TOMBSTONE]
        counts = np.bincount(hit_ords)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {"ord": nz.astype(np.int64), "cnt": counts[nz].astype(np.int64)}
        )
    if facet_range_spec is not None:
        # range faceting (facet.range): bucket the matched docs'
        # numeric docvalues into [start + i*gap, start + (i+1)*gap);
        # per-segment partials are at most n_buckets rows, merged by
        # sum — the ordinal-facet shape with arithmetic in place of
        # the dictionary
        f_col, f_start, f_gap, f_nb, f_end = facet_range_spec
        if len(docs) == 0 or f_col not in dvs:
            return _empty_facet()
        arr = dvs[f_col]
        ids = docs - dv_lo[f_col]
        valid = (ids >= 0) & (ids < len(arr))
        raw = arr[ids[valid]]
        # TOMBSTONE slots are compacted-away deletions — same guard as
        # the ordinal-facet block; [start, end) enforced explicitly so
        # a non-gap-aligned end never spills into the last bucket
        raw = raw[raw != TOMBSTONE]
        vals = raw.astype(np.float64)
        buckets = np.floor((vals - f_start) / f_gap).astype(np.int64)
        ok = (buckets >= 0) & (buckets < f_nb) & (vals < f_end)
        counts = np.bincount(buckets[ok], minlength=f_nb)
        nz = np.flatnonzero(counts)
        return pd.DataFrame(
            {"ord": nz.astype(np.int64), "cnt": counts[nz].astype(np.int64)}
        )
    if stats_col is not None:
        # stats component (StatsComponent): one mergeable moment row
        # per segment — count/sum/sum-of-squares/min/max; mean and
        # stddev derive exactly at merge time
        if len(docs) == 0 or stats_col not in dvs:
            return _empty_stats()
        arr = dvs[stats_col]
        ids = docs - dv_lo[stats_col]
        valid = (ids >= 0) & (ids < len(arr))
        raw = arr[ids[valid]]
        # TOMBSTONE sentinel (2^48-1) would corrupt every moment —
        # same strip as the facet/collapse blocks
        raw = raw[raw != TOMBSTONE]
        if len(raw) == 0:
            return _empty_stats()
        vals = raw.astype(np.float64)
        return pd.DataFrame(
            {
                "cnt": np.array([len(vals)], np.int64),
                "s": np.array([vals.sum()], np.float64),
                "ss": np.array([(vals * vals).sum()], np.float64),
                "mn": np.array([vals.min()], np.float64),
                "mx": np.array([vals.max()], np.float64),
            }
        )
    if hist_col is not None:
        # exact value histogram of the matched docset — (value, cnt)
        # rows bounded by the segment's distinct-value count, the
        # mergeable basis for exact percentiles (stats.percentiles)
        if len(docs) == 0 or hist_col not in dvs:
            return _empty_facet()
        arr = dvs[hist_col]
        ids = docs - dv_lo[hist_col]
        valid = (ids >= 0) & (ids < len(arr))
        raw = arr[ids[valid]]
        raw = raw[raw != TOMBSTONE]
        if len(raw) == 0:
            return _empty_facet()
        uniq, cnts = np.unique(raw, return_counts=True)
        return pd.DataFrame(
            {"ord": uniq.astype(np.int64), "cnt": cnts.astype(np.int64)}
        )
    if stats_facet_spec is not None:
        # stats.facet: the stats moment row computed PER facet
        # ordinal — at most |segment facet vocab| rows leave the
        # kernel, merged by (gen, ord) then by value upstream
        s_col, f_col = stats_facet_spec
        if len(docs) == 0 or s_col not in dvs or f_col not in dvs:
            return _empty_stats_facet()
        vals_arr = dvs[s_col]
        ords_arr = dvs[f_col]
        ids_v = docs - dv_lo[s_col]
        ids_o = docs - dv_lo[f_col]
        valid = (
            (ids_v >= 0)
            & (ids_v < len(vals_arr))
            & (ids_o >= 0)
            & (ids_o < len(ords_arr))
        )
        raw = vals_arr[ids_v[valid]]
        hit_ords = ords_arr[ids_o[valid]].astype(np.int64)
        # TOMBSTONE in either stream = compacted deletion
        live = (raw != TOMBSTONE) & (hit_ords != TOMBSTONE)
        raw, hit_ords = raw[live], hit_ords[live]
        if len(raw) == 0:
            return _empty_stats_facet()
        vals = raw.astype(np.float64)
        uniq, inv = np.unique(hit_ords, return_inverse=True)
        s = np.zeros(len(uniq), np.float64)
        np.add.at(s, inv, vals)
        ss = np.zeros(len(uniq), np.float64)
        np.add.at(ss, inv, vals * vals)
        mn = np.full(len(uniq), np.inf, np.float64)
        np.minimum.at(mn, inv, vals)
        mx = np.full(len(uniq), -np.inf, np.float64)
        np.maximum.at(mx, inv, vals)
        return pd.DataFrame(
            {
                "ord": uniq.astype(np.int64),
                "cnt": np.bincount(inv).astype(np.int64),
                "s": s,
                "ss": ss,
                "mn": mn,
                "mx": mx,
            }
        )
    if collapse_ord_col is not None:
        # field collapse (CollapsingQParserPlugin): the segment's
        # winner per group ordinal — (rounded-score desc, doc_id asc),
        # the same total order the client sees, so cross-segment
        # merging by max is exact. At most |segment group vocab| rows
        # leave the kernel, never the match set.
        if len(docs) == 0 or collapse_ord_col not in dvs:
            return _empty_collapse()
        ords_arr = dvs[collapse_ord_col]
        c_lo = dv_lo[collapse_ord_col]
        ids = docs - c_lo
        valid = (ids >= 0) & (ids < len(ords_arr))
        docs_v, scores_v = docs[valid], scores[valid]
        hit_ords = ords_arr[ids[valid]].astype(np.int64)
        live = hit_ords != TOMBSTONE
        docs_v, scores_v, hit_ords = docs_v[live], scores_v[live], hit_ords[live]
        if len(docs_v) == 0:
            return _empty_collapse()
        scores_r = _spark_round(scores_v, round_to)
        # lexsort: last key is primary -> (ord, -score, doc_id)
        order = np.lexsort((docs_v, -scores_r, hit_ords))
        o_s, d_s, s_s = hit_ords[order], docs_v[order], scores_r[order]
        _, first, counts = np.unique(o_s, return_index=True, return_counts=True)
        if collapse_limit <= 1:
            keep = first
        else:
            # result grouping (group.limit=n): top-n per ordinal —
            # rank within each ordinal run, keep ranks < n
            ranks = np.arange(len(o_s)) - np.repeat(first, counts)
            keep = np.flatnonzero(ranks < collapse_limit)
        return pd.DataFrame(
            {
                "ord": o_s[keep].astype(np.int64),
                "doc_id": d_s[keep].astype(np.int64),
                "score": s_s[keep].astype(np.float64),
            }
        )
    if len(docs) == 0:
        return empty
    return _topk_frame(docs, scores, k)


def _empty_facet() -> pd.DataFrame:
    return pd.DataFrame(
        {"ord": pd.Series([], dtype="int64"), "cnt": pd.Series([], dtype="int64")}
    )


def _empty_collapse() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "ord": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )


def _empty_stats_facet() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "ord": pd.Series([], dtype="int64"),
            "cnt": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="float64"),
            "ss": pd.Series([], dtype="float64"),
            "mn": pd.Series([], dtype="float64"),
            "mx": pd.Series([], dtype="float64"),
        }
    )


def _empty_stats() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "cnt": pd.Series([], dtype="int64"),
            "s": pd.Series([], dtype="float64"),
            "ss": pd.Series([], dtype="float64"),
            "mn": pd.Series([], dtype="float64"),
            "mx": pd.Series([], dtype="float64"),
        }
    )


def _prepare_boolean(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
    str_cols: tuple = (),
    extra_terms: tuple = (),
    extra_dv_cols: tuple = (),
):
    """Shared preparation for the packed boolean paths: parse, build
    per-field scoring contexts (sidecar dfs, avgdl, k1/b overrides)
    and the unified per-segment frame (postings + doclens + docvalues
    rows). ``extra_terms`` adds default-field terms beyond the tree's
    own leaves to the postings fetch + idf context (the feedback
    expansion SHOULD terms).

    ``seg_index`` may be a LIST of SegmentIndex (streamed generations
    before compaction, disjoint doc sets): dfs sum across the
    generations' sidecars, n/avgdl aggregate globally, and every
    generation's segments stack into the one unified frame with
    namespaced seg ids — the wand_search_multi statistics contract
    applied to the whole boolean path. Returns (tree, field_ctx,
    unified)."""
    from ..query import ast as qast
    from ..query.compiler import _leaf_terms
    from ..query.parser import parse_query

    gens: list[tuple[int, SegmentIndex]] = _as_gens(seg_index)
    seg_index = gens[0][1]
    field_segments = field_segments or {}
    if field_segments and len(gens) > 1:
        raise ValueError(
            "field_segments with multiple generations is unsupported — "
            "compact each field index first (compact_packed), then route"
        )
    for fname, fsi in field_segments.items():
        if fsi.seg_size != seg_index.seg_size:
            raise ValueError(
                f"field index {fname!r} seg_size {fsi.seg_size} != "
                f"{seg_index.seg_size} — per-segment routing needs "
                "aligned doc ranges"
            )

    def _has_quote(node) -> bool:
        if isinstance(node, qast.Quote):
            return True
        if isinstance(node, (qast.Or, qast.And)):
            return _has_quote(node.left) or _has_quote(node.right)
        if isinstance(node, qast.Not):
            return _has_quote(node.child)
        if isinstance(node, qast.FieldQuery):
            return _has_quote(node.child)
        return False

    tree, _errors = parse_query(query)
    # per-field term sets: a field's dictionary only resolves terms
    # under ITS FieldQuery subtrees; everything else is default-field
    def _field_terms(node, fld: str, out: dict) -> None:
        if isinstance(node, (qast.Or, qast.And)):
            _field_terms(node.left, fld, out)
            _field_terms(node.right, fld, out)
        elif isinstance(node, (qast.Not, qast.Quote)):
            _field_terms(node.child, fld, out)
        elif isinstance(node, qast.FieldQuery):
            fname = node.field.rstrip(":")
            nxt = fname if fname in field_segments else fld
            if not isinstance(node.child, qast.Range):
                _field_terms(node.child, nxt, out)
        elif isinstance(node, qast.Operand):
            out.setdefault(fld, set()).update(_leaf_terms(node))

    by_field: dict[str, set] = {}
    _field_terms(tree, "", by_field)
    if extra_terms:
        by_field.setdefault("", set()).update(extra_terms)
    with_subs = _has_quote(tree)

    def _range_fields(node, out: set) -> None:
        if isinstance(node, (qast.Or, qast.And)):
            _range_fields(node.left, out)
            _range_fields(node.right, out)
        elif isinstance(node, (qast.Not, qast.Quote)):
            _range_fields(node.child, out)
        elif isinstance(node, qast.Range):
            out.add("doc_id")
        elif isinstance(node, qast.FieldQuery):
            if isinstance(node.child, qast.Range):
                out.add(node.field.rstrip(":"))
            else:
                _range_fields(node.child, out)

    range_fields: set = set()
    _range_fields(tree, range_fields)
    # extra_dv_cols: value streams a caller needs beyond the tree's
    # own Range fields (e.g. a boost_fn ValueSource column)
    dv_needed = sorted((range_fields | set(extra_dv_cols)) - {"doc_id"})
    for _, si in gens:
        not_packed = [c for c in dv_needed if c not in si.value_cols]
        if not_packed:
            raise ValueError(
                f"packed range/boost over {not_packed} needs docvalues streams — "
                f"rebuild with build_segments(..., value_cols={not_packed}) "
                "or use the flat path (doc_id ranges are intrinsic)"
            )

    # local-tier decision covers EVERYTHING this query will touch:
    # every field's term-pruned postings + doclens/deletes, plus the
    # docvalues / ordinal stream directories the tree or caller needs.
    # ONE sidecar read per (field, generation) feeds both the byte
    # estimate and the idf context below.
    local_pairs: list = []
    pair_stats: list = []
    stats_by: dict = {}
    for fname, fsi in [("", seg_index)] + sorted(field_segments.items()):
        f_terms = sorted(by_field.get(fname, set()))
        for gid, si in (gens if fname == "" else [(0, fsi)]):
            st = _sidecar_stats(si.path, f_terms)
            local_pairs.append((si, f_terms))
            pair_stats.append(st)
            stats_by[(fname, gid)] = st
    local_dirs = [
        os.path.join(si.path, "docvalues", col)
        for col in dv_needed
        for _, si in gens
    ] + [
        os.path.join(si.path, "docvalues_str", col, "streams")
        for col in str_cols
        for _, si in gens
    ]
    est = _local_estimate(
        local_pairs, with_subs, local_dirs, stats_list=pair_stats
    )
    budget = _local_tier_budget()
    local = 0 < budget and est is not None and est <= budget

    field_ctx: dict[str, dict] = {}
    unified = None
    for fname, fsi in [("", seg_index)] + sorted(field_segments.items()):
        f_gens = gens if fname == "" else [(0, fsi)]
        terms = sorted(by_field.get(fname, set()))
        dfs: dict[str, int] = {}
        for gid, _si in f_gens:
            d = stats_by[(fname, gid)] if terms else {}
            if d is None:
                raise ValueError(
                    f"boolean packed search needs the termstats sidecar "
                    f"(field {fname or 'default'!r})"
                )
            for t, (v, _c) in d.items():
                dfs[t] = dfs.get(t, 0) + int(v)
        n = sum(si.n_docs for _, si in f_gens)
        total_tokens = sum(si.avgdl * si.n_docs for _, si in f_gens)
        field_ctx[fname] = {
            "idfs": {
                t: float(np.log(1.0 + (n - d + 0.5) / (d + 0.5)))
                for t, d in dfs.items()
                if d > 0
            },
            "avgdl": total_tokens / n if n else 0.0,
        }
        # per-field k1/b (``field_sims``: field -> Similarity) — the
        # SchemaSimilarityFactory per-field override mechanism. The
        # packed boolean path is BM25-specialized; other kinds run via
        # wand_search(sim=...).
        fsim = (field_sims or {}).get(fname)
        if fsim is not None:
            if getattr(fsim, "kind", "bm25") != "bm25":
                raise ValueError(
                    "packed boolean field_sims supports BM25 variants "
                    f"(per-field k1/b); got kind={fsim.kind!r} for "
                    f"field {fname or 'default'!r}"
                )
            field_ctx[fname]["k1"] = float(fsim.k1)
            field_ctx[fname]["b"] = float(fsim.b)
        frame = _unified_frame(
            spark, f_gens, terms or ["\x00none"],
            with_subs=with_subs, field=fname, local=local,
        )
        unified = _stack(unified, frame)
    for col in dv_needed:
        for gen_id, si in gens:
            unified = _stack(
                unified,
                _dv_frame(
                    spark, si, col, with_subs,
                    seg_offset=gen_id * 1_000_000, local=local,
                ),
            )
    for col in str_cols:
        for gen_id, si in gens:
            unified = _stack(
                unified,
                _dv_frame(
                    spark, si, col, with_subs, subdir="docvalues_str",
                    seg_offset=gen_id * 1_000_000, local=local,
                ),
            )

    if not local and est is not None and est > SINGLE_STAGE_MAX_BYTES:
        # big pruned frame: route _apply_per_segment to the exchange
        # path (parallel kernels) instead of one coalesce(1) task
        unified._spl_big_frame = True
    return tree, field_ctx, unified


def _boost_dv_cols(boost_fn: tuple | None) -> tuple:
    """docvalues columns a boost_fn ValueSource needs fetched
    (nothing for the intrinsic doc_id key)."""
    if boost_fn is None or boost_fn[0] == "doc_id":
        return ()
    return (boost_fn[0],)


def wand_boolean_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
    boost_fn: tuple | None = None,
) -> DataFrame:
    """Parsed boolean query (NOT > AND > OR precedence, the reference
    grammar) over PACKED segments: the boolean tree evaluates
    independently per segment (boolean algebra is doc-local; segments
    partition docs), one Spark job, k rows per segment merged
    globally. Rank-identical to the flat execute_query
    (tests/test_segments_v3.py). Supports Operand/And/Or/Not/Quote
    plus FieldQuery routing to per-field packed indexes
    (``field_segments``: field name -> SegmentIndex built over that
    field's flat index; must share the doc space and seg_size so the
    per-segment evaluation stays aligned; ``field_sims``: per-field
    k1/b overrides) and Range terminals — over the intrinsic doc_id
    key, or over any numeric column packed as a docvalues stream
    (``build_segments(..., value_cols=[...])``).

    ``seg_index`` may be a LIST of generations (streamed deltas,
    disjoint doc sets): dfs sum across the generations' sidecars and
    n/avgdl aggregate globally, so results equal the compacted
    index's — boolean serving never waits for compaction."""
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_dv_cols=_boost_dv_cols(boost_fn),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, k, k1, b, boost_fn_spec=boost_fn
        )

    if isinstance(unified, pd.DataFrame):
        return _local_topk_frame(
            spark, _kernel_pdf(unified, per_segment), k, round_to
        )
    seg_tops = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    return (
        seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def wand_boolean_boosted_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    boost_terms: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
    boost_fn: tuple | None = None,
) -> DataFrame:
    """The feedback FINAL query on the packed path: seed query MUST +
    expansion SHOULD (UnsupervisedFeedbackHelper.java:110-118).
    Candidates are the boolean tree's matches; each (term, boost) in
    ``boost_terms`` adds boost*BM25 on co-occurring docs. Same
    one-job shape as wand_boolean_search — the expansion terms ride
    the same term-isin-pruned postings scan and the same per-segment
    Arrow stage; the merge stays k rows per segment."""
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_terms=tuple(sorted({t for t, _ in boost_terms})),
        extra_dv_cols=_boost_dv_cols(boost_fn),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, k, k1, b, boost_terms=boost_terms,
            boost_fn_spec=boost_fn,
        )

    if isinstance(unified, pd.DataFrame):
        return _local_topk_frame(
            spark, _kernel_pdf(unified, per_segment), k, round_to
        )
    seg_tops = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    return (
        seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def fetch_docs(
    spark: SparkSession,
    seg_index: SegmentIndex,
    doc_ids: list[int],
) -> DataFrame:
    """Stored-field retrieval from the packed index — the
    ir.document(docNum) analogue (MoreLikeThis.java:1113-1145): rows
    for a bounded doc-id set (a top-k result page) from the
    seg-partitioned docstore. The seg-isin predicate prunes to the
    segments actually hit (partition pruning) and the doc_id filter
    pushes into those files' row groups — a point-read pattern, never
    a corpus scan."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if not si.store_cols:
            raise ValueError(
                "packed index has no docstore — rebuild with "
                "build_segments(..., store_cols=[...])"
            )
    if len({si.store_cols for _, si in gens}) > 1:
        raise ValueError(
            "fetch_docs across generations needs identical store_cols; "
            f"got {[si.store_cols for _, si in gens]}"
        )
    ids = [int(d) for d in doc_ids]
    out = None
    for _, si in gens:
        # liveDocs: tombstoned ids are not retrievable (driver-side
        # bounded read of the tombstone streams, same contract as the
        # sidecar; post-compaction the docstore rows are gone anyway)
        tombs = _load_tombstones(si.path)
        if tombs:
            dead = set(
                int(x) for v in tombs.values() for x in v
            )
            ids_g = [d for d in ids if d not in dead]
        else:
            ids_g = ids
        if not ids_g:
            continue
        # generations hold disjoint doc sets: each point read prunes to
        # the segments the ids COULD live in; ids outside this
        # generation's doc range just match nothing
        segs = sorted({d // si.seg_size for d in ids_g})
        base = os.path.join(si.path, "docstore")
        rd = spark.read.option("basePath", base)
        if si.store_schema:
            # explicit schema (recorded at build time): skips the
            # footer-inference Spark job a bare parquet read pays —
            # the point read stays a single job
            rd = rd.schema(si.store_schema + ", seg int, group int")
        f = (
            rd.parquet(base)
            .filter(F.col("seg").isin(segs))
            .filter(F.col("doc_id").isin(ids_g))
            .drop("seg", "group")
        )
        out = f if out is None else out.unionByName(f)
    if out is None:
        # every requested id was tombstoned: empty frame, stable schema
        _, si0 = gens[0]
        schema = (
            si0.store_schema
            or ("doc_id bigint, " + ", ".join(f"{c} string" for c in si0.store_cols))
        )
        return empty_df(spark, schema)
    return out


def fetch_docs_local(seg_index, doc_ids: list[int], columns: list[str] | None = None):
    """Driver-side docstore point read for a BOUNDED id list — ZERO
    Spark jobs (pyarrow dataset, same bounded-driver-read contract as
    the termstats sidecar / tombstone streams). The hive layout
    (docstore/group=g/seg=s/, rows sorted by doc_id) makes the
    seg-isin filter a directory prune and the doc_id-isin a row-group
    prune, so the read is O(requested ids), never a corpus scan.

    This is the serving hot path for seed-text retrieval: the packed
    /mlt and /uf handlers fetch <= max_seed_docs texts per request,
    and paying a Spark job (scheduling + stage round-trip, ~0.3 s on
    a loaded driver) for a point read of a handful of rows was the
    difference between a 3-job and a 2-job /uf (BENCH/BASELINE.md
    r06). The dataset is constructed from the EXPLICIT
    group=<seg%groups>/seg=<seg> directories derived from the
    requested ids — never the docstore root, whose recursive listing
    would be O(total segments) driver work on a large index. Returns
    a pandas frame (doc_id + requested columns), tombstoned ids
    excluded — identical rows to ``fetch_docs(...).toPandas()``
    (tests/test_segments_v3.py)."""
    import pyarrow.dataset as ds

    gens = _as_gens(seg_index)
    for _, si in gens:
        if not si.store_cols:
            raise ValueError(
                "packed index has no docstore — rebuild with "
                "build_segments(..., store_cols=[...])"
            )
    # same contract as fetch_docs: mixed store_cols across generations
    # would pd.concat into a silent NaN-filled column union
    if len({si.store_cols for _, si in gens}) > 1:
        raise ValueError(
            "fetch_docs_local across generations needs identical "
            f"store_cols; got {[si.store_cols for _, si in gens]}"
        )
    ids = [int(d) for d in doc_ids]
    frames = []
    for _, si in gens:
        tombs = _load_tombstones(si.path)
        if tombs:
            dead = {int(x) for v in tombs.values() for x in v}
            ids_g = [d for d in ids if d not in dead]
        else:
            ids_g = ids
        if not ids_g:
            continue
        n_groups = int((_read_manifest(si.path) or {}).get("n_groups", 1))
        segs = sorted({d // si.seg_size for d in ids_g})
        files: list[str] = []
        for s in segs:
            d = os.path.join(
                si.path, "docstore", f"group={s % n_groups}", f"seg={s}"
            )
            # ids a generation doesn't hold (disjoint doc sets across
            # generations, or ids past the end) have no seg dir — skip
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        if not files:
            continue
        cols = ["doc_id"] + [
            c for c in (columns or list(si.store_cols)) if c != "doc_id"
        ]
        dset = ds.dataset(files, format="parquet")
        tbl = dset.to_table(
            columns=cols, filter=ds.field("doc_id").isin(ids_g)
        )
        frames.append(tbl.to_pandas())
    import pandas as pd

    if not frames:
        _, si0 = gens[0]
        cols = ["doc_id"] + [
            c for c in (columns or list(si0.store_cols)) if c != "doc_id"
        ]
        return pd.DataFrame({c: [] for c in cols})
    out = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
    return out.sort_values("doc_id", kind="stable").reset_index(drop=True)


def wand_facet_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    facet_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Facet counts over the FULL docset matching a boolean query, on
    the packed path (the match+facet behavior —
    DiceMoreLikeThisHandler.java:263-271 / DocValuesFacets.getCounts):
    the tree evaluates per segment, matched docs map to ordinals from
    the ``facet_col`` SortedDocValues stream (build_segments
    string_cols), and per-segment (ordinal, count) partials — at most
    |facet vocabulary| rows each — merge in one vocab-bounded agg and
    join the broadcast ordinal dictionary back to values. The corpus
    is never touched at query time; ONE Spark job.

    ``seg_index`` may be a LIST of generations (disjoint doc sets):
    each generation has its OWN ordinal dictionary, so partials carry
    the generation id, join their generation's dictionary, and merge
    by VALUE — counts equal the compacted index's."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if facet_col not in si.string_cols:
            raise ValueError(
                f"packed faceting over {facet_col!r} needs an ordinal "
                "docvalues stream — rebuild with build_segments(..., "
                f"string_cols=[{facet_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        str_cols=(facet_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, facet_ord_col=facet_col
        )
        out.insert(0, "gen", np.int64(int(pdf["seg"].iloc[0]) // 1_000_000))
        return out

    if isinstance(unified, pd.DataFrame):
        # r07: the partial-sum -> broadcast dict join -> value-sum tail
        # over a bounded local relation scheduled two mini Spark jobs
        # of pure scheduling; integer sums are exact driver-side
        return _local_facet_counts(
            spark, _kernel_pdf(unified, per_segment), gens, facet_col
        )
    partials = _apply_per_segment(
        unified, per_segment, "gen long, ord long, cnt long",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    dicts = None
    for gen_id, si in gens:
        dpath = os.path.join(si.path, "docvalues_str", facet_col, "dict")
        d = spark.read.parquet(dpath).withColumn(
            "gen", F.lit(gen_id).cast("long")
        )
        dicts = d if dicts is None else dicts.unionByName(d)
    return (
        partials.groupBy("gen", "ord")
        .agg(F.sum("cnt").alias("cnt"))
        .join(F.broadcast(dicts), ["gen", "ord"], "left")
        .groupBy("value")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.col("value").alias(facet_col), "cnt")
    )


def wand_collapse_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    collapse_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Field collapse on the packed path — Solr's
    CollapsingQParserPlugin (`fq={!collapse field=...}`): one
    representative doc per ``collapse_col`` value — the group's
    highest-scoring match under the deterministic (score desc, doc_id
    asc) order — then top-k over representatives. The dedup-to-best
    serving shape (one hit per conversation / per source domain).

    Plan at scale: the boolean tree evaluates per segment, matched
    docs map to ordinals from the collapse column's SortedDocValues
    stream (build_segments string_cols), and the kernel emits ONE
    winner row per segment-local ordinal — at most |group vocab| rows
    per segment, never the match set. Winners merge in one
    vocab-bounded max_by agg and join the broadcast ordinal
    dictionary back to values; the corpus is never touched at query
    time. ONE Spark job, exactly the wand_facet_search shape with
    max_by in place of sum.

    ``seg_index`` may be a LIST of generations (disjoint doc sets):
    partials carry the generation id, join their generation's own
    dictionary, and merge by VALUE — winners equal the compacted
    index's."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if collapse_col not in si.string_cols:
            raise ValueError(
                f"packed collapse over {collapse_col!r} needs an ordinal "
                "docvalues stream — rebuild with build_segments(..., "
                f"string_cols=[{collapse_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        str_cols=(collapse_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b,
            collapse_ord_col=collapse_col, round_to=round_to,
        )
        out.insert(0, "gen", np.int64(int(pdf["seg"].iloc[0]) // 1_000_000))
        return out

    if isinstance(unified, pd.DataFrame):
        # r07: per-value winner + top-k finalize driver-side (same
        # comparator, scores already kernel-rounded) — zero Spark jobs
        return _local_collapse_topk(
            spark, _kernel_pdf(unified, per_segment), gens, collapse_col, k
        )
    partials = _apply_per_segment(
        unified, per_segment, "gen long, ord long, doc_id long, score double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    dicts = None
    for gen_id, si in gens:
        dpath = os.path.join(si.path, "docvalues_str", collapse_col, "dict")
        d = spark.read.parquet(dpath).withColumn(
            "gen", F.lit(gen_id).cast("long")
        )
        dicts = d if dicts is None else dicts.unionByName(d)
    # (gen, ord) -> value, then ONE max_by per value: the winner
    # comparator (score, -doc_id) reproduces (score desc, doc_id asc)
    winner = F.max_by(
        F.struct("doc_id", "score"),
        F.struct(F.col("score"), (-F.col("doc_id")).alias("nd")),
    )
    return (
        partials.join(F.broadcast(dicts), ["gen", "ord"], "left")
        .groupBy("value")
        .agg(winner.alias("w"))
        .select(
            F.col("value").alias(collapse_col),
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.score").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def wand_facet_range_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    facet_col: str,
    start: int,
    end: int,
    gap: int,
    k1: float = 1.2,
    b: float = 0.75,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Range faceting on the packed path — Solr's ``facet.range``
    (RangeFacetProcessor): counts of query-matching docs per
    ``[start + i*gap, start + (i+1)*gap)`` bucket of a numeric
    docvalues column. Zero-count buckets are included (Solr returns
    the full lattice); values outside [start, end) are ignored (the
    facet.range.other=NONE default).

    Plan: the boolean tree evaluates per segment, matched docs map to
    bucket ids by pure arithmetic over the dense numeric stream, and
    per-segment partials — at most n_buckets rows each — merge in one
    bounded agg joined to a generated bucket lattice. The corpus is
    never touched; ONE Spark job, the wand_facet_search shape with
    floor-divide in place of the ordinal dictionary."""
    if gap <= 0 or end <= start:
        raise ValueError("facet.range needs gap > 0 and end > start")
    n_buckets = -(-(end - start) // gap)
    gens = _as_gens(seg_index)
    for _, si in gens:
        if facet_col not in si.value_cols:
            raise ValueError(
                f"packed range faceting over {facet_col!r} needs a numeric "
                "docvalues stream — rebuild with build_segments(..., "
                f"value_cols=[{facet_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_dv_cols=(facet_col,),
    )
    spec = (facet_col, float(start), float(gap), int(n_buckets), float(end))

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, facet_range_spec=spec
        )

    if isinstance(unified, pd.DataFrame):
        # r07: the lattice left-join + sum tail scheduled three mini
        # jobs (range + agg + join) over bounded local relations;
        # integer bucket sums are exact driver-side
        return _local_facet_range(
            spark, _kernel_pdf(unified, per_segment), int(start), int(gap),
            n_buckets,
        )
    partials = _apply_per_segment(
        unified, per_segment, "ord long, cnt long",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    lattice = spark.range(n_buckets).select(F.col("id").alias("ord"))
    return (
        lattice.join(
            partials.groupBy("ord").agg(F.sum("cnt").alias("cnt")), "ord", "left"
        )
        .select(
            (F.lit(int(start)) + F.col("ord") * F.lit(int(gap))).alias("bucket"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("bucket")
    )


def wand_stats_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    stats_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Solr StatsComponent (``stats=true&stats.field=...``) on the
    packed path: count / min / max / sum / mean / sample-stddev of a
    numeric docvalues column over the query's matched docset.

    Plan: each segment emits ONE moment row (count, sum, sum of
    squares, min, max) — the classic mergeable-moments trick — and
    the driver-side agg derives mean and the corrected (sample)
    stddev exactly: sqrt((ss - s^2/n) / (n-1)), StatsValuesFactory's
    formula. The matched docset never leaves the kernels."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if stats_col not in si.value_cols:
            raise ValueError(
                f"packed stats over {stats_col!r} needs a numeric "
                "docvalues stream — rebuild with build_segments(..., "
                f"value_cols=[{stats_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_dv_cols=(stats_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, stats_col=stats_col
        )

    if isinstance(unified, pd.DataFrame):
        # r07: the one-row moment merge finalizes driver-side —
        # sequential float accumulation in partials row order is
        # bit-for-bit the single-partition Spark agg
        return _local_stats(spark, _kernel_pdf(unified, per_segment), round_to)
    partials = _apply_per_segment(
        unified, per_segment,
        "cnt long, s double, ss double, mn double, mx double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    n = F.sum("cnt")
    s = F.sum("s")
    ss = F.sum("ss")
    # n == 1: the corrected variance is undefined — NULL, matching
    # both stddev_samp engines (Spark's NaN is normalized the same
    # way on the flat path)
    # clamp the variance operand at 0: floating-point cancellation on
    # near-constant or large-magnitude columns can push ss - s^2/n
    # fractionally negative, which would serve NaN where the flat
    # stddev_samp twin serves 0.0
    stddev = F.when(
        n > 1,
        F.round(
            F.sqrt(F.greatest(ss - s * s / n, F.lit(0.0)) / (n - F.lit(1))),
            round_to,
        ),
    )
    return partials.agg(
        n.alias("cnt"),
        F.min("mn").cast("long").alias("min_v"),
        F.max("mx").cast("long").alias("max_v"),
        s.cast("long").alias("sum_v"),
        F.round(s / n, round_to).alias("mean_v"),
        stddev.alias("stddev_v"),
    ).filter(F.col("cnt") > 0)


def wand_facet_query_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    facet_queries: dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Solr ``facet.query`` on the packed path
    (SimpleFacets.getFacetQueryCounts): for each named subquery, the
    count of docs matching BOTH the main query and that subquery.
    Zero counts served; (name, cnt) ordered by name — the flat twin
    is components.facet_query_search.

    Plan at scale: ONE Spark job. Every facet query's default-field
    terms join the main tree's postings fetch (one pruned scan covers
    all of them), the kernel evaluates main + each subquery per
    segment over the SAME decoded postings, and per-segment
    (name, cnt) rows — |facet_queries| each — merge in one bounded
    sum. Facet queries may use terms, AND/OR/NOT, doc_id ranges, and
    docvalues-column ranges; phrases inside a facet query are
    rejected (the positions sub-stream fetch is main-tree-only)."""
    from ..query import ast as qast
    from ..query.compiler import _leaf_terms
    from ..query.parser import parse_query

    if not facet_queries:
        raise ValueError("facet.query needs at least one named subquery")

    def _walk(node, terms: set, rfields: set) -> None:
        if isinstance(node, (qast.Or, qast.And)):
            _walk(node.left, terms, rfields)
            _walk(node.right, terms, rfields)
        elif isinstance(node, qast.Not):
            _walk(node.child, terms, rfields)
        elif isinstance(node, qast.Quote):
            raise ValueError(
                "facet.query does not support phrases — use the main "
                "query for positional clauses"
            )
        elif isinstance(node, qast.FieldQuery):
            fname = node.field.rstrip(":")
            if isinstance(node.child, qast.Range):
                if fname != "doc_id":
                    rfields.add(fname)
            else:
                raise ValueError(
                    "facet.query field clauses support ranges only "
                    f"(got a term clause for field {fname!r})"
                )
        elif isinstance(node, qast.Operand):
            terms.update(_leaf_terms(node))

    fq_trees: list[tuple[str, object]] = []
    extra_terms: set = set()
    range_fields: set = set()
    for name, fq in facet_queries.items():
        t, _errors = parse_query(fq)
        _walk(t, extra_terms, range_fields)
        fq_trees.append((name, t))
    fq_trees.sort(key=lambda nt: nt[0])
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_terms=tuple(sorted(extra_terms)),
        extra_dv_cols=tuple(sorted(range_fields)),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, count_trees=fq_trees
        )

    if isinstance(unified, pd.DataFrame):
        # r07: per-name integer sums finalize driver-side — zero jobs
        return _local_facet_query_counts(
            spark, _kernel_pdf(unified, per_segment)
        )
    partials = _apply_per_segment(
        unified, per_segment, "name string, cnt long",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    return (
        partials.groupBy("name").agg(F.sum("cnt").alias("cnt")).orderBy("name")
    )


def wand_stats_facet_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    stats_col: str,
    facet_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Solr ``stats.facet`` on the packed path (StatsComponent
    per-bucket stats): count / min / max / sum / mean / sample stddev
    of a numeric docvalues column, computed separately per value of an
    ordinal docvalues column, over the query's matched docset. Empty
    buckets are absent (Solr omits them); ordered by facet value —
    the flat twin is components.stats_facet_search.

    Plan: each segment emits ONE mergeable moment row per facet
    ordinal (at most |segment facet vocab| rows — never the match
    set); partials merge by (generation, ordinal), join the broadcast
    ordinal dictionary, merge again by VALUE across generations, and
    mean/stddev derive exactly from the merged moments
    (StatsValuesFactory's corrected formula, the wand_stats_search
    math applied per bucket)."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if facet_col not in si.string_cols:
            raise ValueError(
                f"packed stats.facet over {facet_col!r} needs an ordinal "
                "docvalues stream — rebuild with build_segments(..., "
                f"string_cols=[{facet_col!r}])"
            )
        if stats_col not in si.value_cols:
            raise ValueError(
                f"packed stats.facet over {stats_col!r} needs a numeric "
                "docvalues stream — rebuild with build_segments(..., "
                f"value_cols=[{stats_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        str_cols=(facet_col,), extra_dv_cols=(stats_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b,
            stats_facet_spec=(stats_col, facet_col),
        )
        out.insert(0, "gen", np.int64(int(pdf["seg"].iloc[0]) // 1_000_000))
        return out

    if isinstance(unified, pd.DataFrame):
        # r07: per-value moment merge finalizes driver-side (sequential
        # accumulation in partials row order == the broadcast-join row
        # order of the Spark tail) — zero Spark jobs
        return _local_stats_facet(
            spark, _kernel_pdf(unified, per_segment), gens, facet_col, round_to
        )
    partials = _apply_per_segment(
        unified, per_segment,
        "gen long, ord long, cnt long, s double, ss double, "
        "mn double, mx double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    dicts = None
    for gen_id, si in gens:
        dpath = os.path.join(si.path, "docvalues_str", facet_col, "dict")
        d = spark.read.parquet(dpath).withColumn(
            "gen", F.lit(gen_id).cast("long")
        )
        dicts = d if dicts is None else dicts.unionByName(d)
    merged = (
        partials.join(F.broadcast(dicts), ["gen", "ord"], "left")
        .groupBy("value")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("s").alias("s"),
            F.sum("ss").alias("ss"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    n = F.col("cnt")
    s = F.col("s")
    ss = F.col("ss")
    # same n==1 NULL rule + cancellation clamp as wand_stats_search
    stddev = F.when(
        n > 1,
        F.round(
            F.sqrt(F.greatest(ss - s * s / n, F.lit(0.0)) / (n - F.lit(1))),
            round_to,
        ),
    )
    return (
        merged.select(
            F.col("value").alias(facet_col),
            n.alias("cnt"),
            F.col("mn").cast("long").alias("min_v"),
            F.col("mx").cast("long").alias("max_v"),
            s.cast("long").alias("sum_v"),
            F.round(s / n, round_to).alias("mean_v"),
            stddev.alias("stddev_v"),
        )
        .filter(F.col("cnt") > 0)
        .orderBy(facet_col)
    )


def wand_stats_percentiles_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    stats_col: str,
    percentiles: list[float],
    k1: float = 1.2,
    b: float = 0.75,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Solr StatsComponent ``percentiles`` on the packed path, served
    EXACTLY: each segment emits the (value, cnt) histogram of its
    matched docs from the numeric docvalues stream — bounded by the
    segment's distinct-value count, never the match set — histograms
    merge in one sum, and the k-th-smallest rule (k = ceil(p*n))
    derives each percentile from the bounded cumulative frame
    (components.percentiles_from_hist; flat twin
    stats_percentiles_search). Solr itself approximates with t-digest;
    for bounded-cardinality docvalues the exact histogram is smaller
    than a digest — swap a mergeable digest into the kernel for
    genuinely unbounded columns, the derivation is unchanged."""
    from ..query.components import percentiles_from_hist

    gens = _as_gens(seg_index)
    for _, si in gens:
        if stats_col not in si.value_cols:
            raise ValueError(
                f"packed percentiles over {stats_col!r} needs a numeric "
                "docvalues stream — rebuild with build_segments(..., "
                f"value_cols=[{stats_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        extra_dv_cols=(stats_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, hist_col=stats_col
        )

    if isinstance(unified, pd.DataFrame):
        # r07: histogram merge + k-th-smallest derivation driver-side
        return _local_percentiles(
            spark, _kernel_pdf(unified, per_segment), percentiles
        )
    partials = _apply_per_segment(
        unified, per_segment, "ord long, cnt long",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    hist = (
        partials.groupBy("ord")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.col("ord").alias("value"), "cnt")
    )
    return percentiles_from_hist(hist, percentiles)


def wand_group_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    group_col: str,
    k_groups: int = 10,
    group_limit: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Result grouping on the packed path — Solr's
    ``group=true&group.field=...&group.limit=n`` (Grouping.java): the
    top ``k_groups`` groups ranked by their best doc (Solr's default
    group sort), each with its top ``group_limit`` members. Field
    collapse is the n=1 special case (wand_collapse_search keeps the
    flat one-row-per-group shape).

    Plan: the kernel emits the per-segment top-n PER ORDINAL (at most
    n * |segment group vocab| rows — never the match set); partials
    join their generation's broadcast dictionary and one
    vocab-bounded agg per value sorts/slices the cross-segment union
    (<= n * n_segments rows per group) into the group's member list;
    groups rank by their head element via TakeOrderedAndProject and
    the k_groups winners explode back to rows. Returns (grp_rank,
    group_col, pos, doc_id, score) ordered by (grp_rank, pos)."""
    gens = _as_gens(seg_index)
    for _, si in gens:
        if group_col not in si.string_cols:
            raise ValueError(
                f"packed grouping over {group_col!r} needs an ordinal "
                "docvalues stream — rebuild with build_segments(..., "
                f"string_cols=[{group_col!r}])"
            )
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
        str_cols=(group_col,),
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b,
            collapse_ord_col=group_col, round_to=round_to,
            collapse_limit=group_limit,
        )
        out.insert(0, "gen", np.int64(int(pdf["seg"].iloc[0]) // 1_000_000))
        return out

    if isinstance(unified, pd.DataFrame):
        # r07: member-list sort/slice + group ranking driver-side
        return _local_group_topn(
            spark, _kernel_pdf(unified, per_segment), gens, group_col,
            k_groups, group_limit,
        )
    partials = _apply_per_segment(
        unified, per_segment, "gen long, ord long, doc_id long, score double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    )
    dicts = None
    for gen_id, si in gens:
        dpath = os.path.join(si.path, "docvalues_str", group_col, "dict")
        d = spark.read.parquet(dpath).withColumn(
            "gen", F.lit(gen_id).cast("long")
        )
        dicts = d if dicts is None else dicts.unionByName(d)
    # sort_array ascending over (ns=-score, doc_id) == (score desc,
    # doc_id asc); slice keeps the group's true top-n because every
    # segment already contributed its local top-n
    member = F.struct(
        (-F.col("score")).alias("ns"), F.col("doc_id").alias("doc_id"),
        F.col("score").alias("score"),
    )
    grouped = (
        partials.join(F.broadcast(dicts), ["gen", "ord"], "left")
        .groupBy("value")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(member)), 1, int(group_limit)
            ).alias("members")
        )
        .select(
            F.col("value").alias(group_col),
            "members",
            F.element_at("members", 1).alias("head"),
        )
        .orderBy(F.asc("head.ns"), F.asc("head.doc_id"))
        .limit(k_groups)
    )
    from pyspark.sql import Window

    # grp_rank over <= k_groups rows — a bounded ranking, not a sort
    # of the match set
    ranked = grouped.select(
        F.row_number()
        .over(Window.orderBy(F.asc("head.ns"), F.asc("head.doc_id")))
        .alias("grp_rank"),
        group_col,
        "members",
    )
    return ranked.select(
        "grp_rank",
        group_col,
        F.posexplode("members").alias("pos0", "m"),
    ).select(
        "grp_rank",
        group_col,
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("m.doc_id").alias("doc_id"),
        F.col("m.score").alias("score"),
    ).orderBy("grp_rank", "pos")


def wand_scores_for_ids(
    spark: SparkSession,
    seg_index: SegmentIndex,
    query: str,
    doc_ids: list[int],
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Scores of a BOUNDED doc-id set under a boolean query — the
    second-pass primitive behind re-ranking and query elevation: the
    tree evaluates per segment against the broadcast allowlist, each
    segment emits at most |allowlist| rows, and ids the query does not
    match are simply absent. ONE Spark job; the match set never leaves
    the kernels."""
    allow = np.unique(np.asarray([int(d) for d in doc_ids], np.int64))
    tree, field_ctx, unified = _prepare_boolean(
        spark, seg_index, query, field_segments, field_sims,
    )

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_boolean_topk(
            pdf, tree, field_ctx, 0, k1, b, only_doc_ids=allow
        )

    if isinstance(unified, pd.DataFrame):
        res = _kernel_pdf(unified, per_segment)
        if res is None:
            return empty_df(spark, "doc_id long, score double")
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": res["doc_id"].to_numpy(np.int64),
                    "score": _spark_round(
                        res["score"].to_numpy(np.float64), round_to
                    ),
                }
            ),
            schema="doc_id long, score double",
        )
    return _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(seg_index, *(field_segments or {}).values()), spark=spark,
    ).select("doc_id", F.round("score", round_to).alias("score"))


def wand_rerank_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    base_query: str,
    rerank_query: str,
    k: int = 10,
    rerank_docs: int = 30,
    weight: float = 1.0,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    field_segments: dict[str, SegmentIndex] | None = None,
    field_sims: dict | None = None,
) -> DataFrame:
    """Two-pass re-ranking on the packed path — Solr's
    ReRankQParserPlugin (`rq={!rerank reRankQuery=... reRankDocs=N
    reRankWeight=w}`): the base query ranks, the top ``rerank_docs``
    are re-scored as ``base + weight * rerank_score``, and the re-sorted
    page is served. The cheap-retrieval + expensive-rescoring shape
    every learning-to-rank deployment sits on.

    Job shape (the bounded-driver-crossing discipline of the packed
    /mlt and /uf handlers): pass 1 = base top-N (per-segment fan-out,
    N rows cross the driver); pass 2 = the rerank tree evaluated per
    segment against the broadcast N-id allowlist — each segment emits
    at most |allowlist| rows, the match set never leaves the kernel.
    The final combine joins the N-row local base frame, whose
    broadcast build schedules as its own (driver-local, N-row) job —
    3 Spark jobs total, the same budget as the packed /uf handler,
    every one k/N-row bounded regardless of how many docs match
    either query (asserted in tests/test_serving_plans.py).

    ``k`` must be <= ``rerank_docs`` (Solr serves reranked rows from
    within the reRankDocs prefix; the below-N tail keeps base order —
    a page past N is a base-query cursor page, not a rerank)."""
    if k > rerank_docs:
        raise ValueError(
            f"rerank serves from the top-{rerank_docs} prefix; page size "
            f"k={k} exceeds it — raise rerank_docs or page the base query"
        )
    base_rows = wand_boolean_search(
        spark, seg_index, base_query, k=rerank_docs, k1=k1, b=b,
        round_to=round_to, field_segments=field_segments,
        field_sims=field_sims,
    ).collect()  # bounded: rerank_docs rows
    if not base_rows:
        return empty_df(spark, "doc_id long, score double")
    rr_rows = wand_scores_for_ids(
        spark, seg_index, rerank_query,
        [int(r["doc_id"]) for r in base_rows],
        k1=k1, b=b, round_to=round_to,
        field_segments=field_segments, field_sims=field_sims,
    ).collect()  # bounded: at most |base_rows| rows

    # both sides are bounded driver-side rows, so the combine is pure
    # arithmetic over <= rerank_docs entries — r07: the former
    # createDataFrame + left-join + TakeOrdered plan scheduled a third
    # Spark job (~0.4 s at the 2M-turn bench shape) to add <=30
    # numbers. Rounding via _spark_round == F.round (exact HALF_UP),
    # ordering via the same (score desc, doc_id asc) lexsort the
    # packed kernels use, so results are identical to the join plan.
    rr = {int(r["doc_id"]): float(r["score"]) for r in rr_rows}
    ids = np.array([int(r["doc_id"]) for r in base_rows], np.int64)
    base = np.array([float(r["score"]) for r in base_rows], np.float64)
    boost = np.array([rr.get(int(d), 0.0) for d in ids], np.float64)
    total = _spark_round(base + float(weight) * boost, round_to)
    order = np.lexsort((ids, -total))[: min(k, len(ids))]
    out = pd.DataFrame({"doc_id": ids[order], "score": total[order]})
    return spark.createDataFrame(out, schema="doc_id long, score double")


def compact_packed(
    spark: SparkSession,
    seg_indexes: list[SegmentIndex],
    out_path: str,
    groups: int = 4,
    resume: bool = True,
) -> SegmentIndex:
    """Merge MULTIPLE packed indexes (streamed generations) into one,
    at the POSTING-BINARY level — the Lucene-style sorted segment
    merge (north rule: "posting-list construction, merge,
    compression"). Unlike compact_generations (which re-encodes from
    flat postings), this never re-tokenizes and never shuffles raw
    posting rows: the unit of work is a (seg, term) group whose
    per-generation binaries are decoded, merge-sorted (generations
    hold disjoint doc sets), and re-encoded in one Arrow pass.

    Doclen streams merge element-wise (disjoint docs: absent = 0, so
    max() is the union). All generations must share seg_size.

    Resumable like build_segments: segments are compacted in
    ``groups`` sequential jobs (seg % groups); each completed group
    appends a manifest entry with lineage + throughput, and a killed
    compaction resumes from the manifest without redoing finished
    groups.
    """
    sizes = {s.seg_size for s in seg_indexes}
    assert len(sizes) == 1, "compact_packed requires a uniform seg_size"
    seg_size = sizes.pop()
    # mixed sub-stream presence would silently drop positions/payloads
    # for terms present in BOTH generations while keeping them for
    # generation-unique terms — an inconsistent index where some
    # phrases raise and others answer. Fail fast instead (flags are
    # None only for pre-r03 manifests, which we let through unchecked).
    for stream in ("has_positions", "has_payloads"):
        flags = {getattr(s, stream) for s in seg_indexes} - {None}
        if len(flags) > 1:
            raise ValueError(
                f"compact_packed: mixed {stream} across input generations "
                f"({[(s.path, getattr(s, stream)) for s in seg_indexes]}) — "
                "rebuild the odd generation with matching sub-streams"
            )
    n_docs = sum(s.n_docs for s in seg_indexes)
    total_tokens = sum(s.avgdl * s.n_docs for s in seg_indexes)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    # the doc-id SPACE is unchanged by deletions (ids are never
    # renumbered — docstore keys and query results stay stable), so
    # segment layout derives from the space, stats from live docs
    n_docs_space = n_docs

    # tombstones across all inputs (driver-side bounded read): raw seg
    # -> sorted unique deleted ids. Generations hold disjoint doc sets,
    # so a plain union per segment is exact.
    del_by_seg: dict[int, np.ndarray] = {}
    for si in seg_indexes:
        for seg, arr in _load_tombstones(si.path).items():
            prev = del_by_seg.get(seg)
            del_by_seg[seg] = (
                arr if prev is None else np.unique(np.concatenate([prev, arr]))
            )

    posts = None
    dls = None
    for si in seg_indexes:
        p = spark.read.option(
            "basePath", os.path.join(si.path, "postings")
        ).schema(POSTINGS_SCHEMA + ", group int").parquet(
            os.path.join(si.path, "postings")
        )
        d = spark.read.option(
            "basePath", os.path.join(si.path, "doclens")
        ).schema(DOCLEN_SCHEMA + ", group int").parquet(
            os.path.join(si.path, "doclens")
        )
        posts = p if posts is None else posts.unionByName(p)
        dls = d if dls is None else dls.unionByName(d)

    if del_by_seg:
        # Lucene merge semantics: the compacted index's stats count
        # LIVE docs only (docFreq/N drop once deletions are purged).
        # The deleted docs' token mass is recovered with ONE small
        # Spark agg over the affected segments' doclen streams: each
        # task's working set is a single segment's streams (a few rows
        # x seg_size ints) and the driver receives exactly two
        # numbers, so a mass compaction touching every segment of a
        # 100-TB index can't balloon driver memory (r05 review item).
        # The per-segment deleted-id lists ship in the UDF closure —
        # tombstones are already a bounded driver-side read above.
        affected = sorted(del_by_seg.keys())
        del_ids_by_seg = {
            int(s): np.asarray(v, dtype=np.int64)
            for s, v in del_by_seg.items()
        }

        def _recover_stats(key, pdf):
            d_ids = del_ids_by_seg[int(key[0])]
            tokens = 0
            live = np.zeros(len(d_ids), dtype=bool)
            for dl_data, lo in zip(pdf["dl_data"], pdf["doc_lo"]):
                arr = _decode_doclens(dl_data)
                idx = d_ids - int(lo)
                ok = (idx >= 0) & (idx < len(arr))
                vals = arr[idx[ok]]
                real = vals != TOMBSTONE
                tokens += int(vals[real].sum())
                # generations hold disjoint docs: at most one
                # generation's stream has a real length for a given
                # id, but dl=0 slots exist in every stream — count
                # each deleted doc once across generations
                live[np.flatnonzero(ok)[real]] = True
            return pd.DataFrame(
                {"del_tokens": [tokens], "n_del_live": [int(live.sum())]}
            )

        rec = (
            dls.filter(F.col("seg").isin(affected))
            .select("seg", "doc_lo", "dl_data")
            .groupBy("seg")
            .applyInPandas(_recover_stats, "del_tokens long, n_del_live long")
            .agg(
                F.sum("del_tokens").alias("t"),
                F.sum("n_del_live").alias("n"),
            )
            .collect()[0]
        )
        n_docs = n_docs - int(rec["n"] or 0)
        total_tokens = total_tokens - int(rec["t"] or 0)
        avgdl = total_tokens / n_docs if n_docs else 0.0

    def merge_postings(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (seg, term), g in pdf.groupby(["seg", "term"], sort=False):
            del_ids = del_by_seg.get(int(seg))
            if len(g) == 1 and del_ids is None:
                # (seg, term) present in a single generation — the
                # common case, since generations hold disjoint doc
                # ranges and most segments belong wholly to one
                # generation. The packed binary is already exactly what
                # a from-scratch build of these docs produces (content
                # is a pure function of the postings), so pass it
                # through untouched: zero decode/encode work, most of a
                # compaction becomes a metadata rewrite.
                r = g.iloc[0]
                rows.append(
                    (
                        int(seg), term, int(r["df"]), int(r["cf"]),
                        list(r["block_last"]), list(r["block_max"]),
                        list(r["block_off"]), r["data"],
                        None if r["pos_off"] is None else list(r["pos_off"]),
                        r["pos_data"], r["pay_data"],
                    )
                )
                continue
            docs_parts, tf_parts, pos_parts, pay_parts = [], [], [], []
            has_pos = has_pay = True
            for _, r in g.iterrows():
                docs, tfs = decode_postings(r["data"])
                docs_parts.append(docs)
                tf_parts.append(tfs)
                if r["pos_data"] is not None:
                    flat = decode_positions(r["pos_data"], tfs)
                    bounds = np.zeros(len(tfs) + 1, np.int64)
                    np.cumsum(tfs, out=bounds[1:])
                    pos_parts.append(
                        [flat[bounds[i]:bounds[i + 1]] for i in range(len(tfs))]
                    )
                else:
                    has_pos = False
                if r["pay_data"] is not None:
                    pay_parts.append(decode_payloads(r["pay_data"]))
                else:
                    has_pay = False
            docs = np.concatenate(docs_parts)
            tfs = np.concatenate(tf_parts)
            order = np.argsort(docs, kind="stable")  # disjoint doc sets
            docs, tfs = docs[order], tfs[order]
            pos_lists = None
            if has_pos and pos_parts:
                flat_lists = [p for part in pos_parts for p in part]
                pos_lists = [flat_lists[i] for i in order]
            pays = None
            if has_pay and pay_parts:
                pays = np.concatenate(pay_parts)[order]
            if del_ids is not None:
                # the physical purge: tombstoned docs leave the posting
                # list here; df/cf/block metadata re-derive from the
                # survivors below
                keep = ~np.isin(docs, del_ids, assume_unique=True)
                docs, tfs = docs[keep], tfs[keep]
                if pos_lists is not None:
                    pos_lists = [
                        pl for pl, kp in zip(pos_lists, keep) if kp
                    ]
                if pays is not None:
                    pays = pays[keep]
                if len(docs) == 0:
                    continue
            data, block_last, block_max, block_off = encode_postings(docs, tfs)
            pos_off = pos_data = pay_data = None
            if pos_lists is not None:
                pos_data, po = encode_positions(pos_lists, tfs)
                pos_off = po.tolist()
            if pays is not None:
                pay_data = encode_payloads(pays)
            rows.append(
                (
                    int(seg), term, len(docs), int(tfs.sum()),
                    block_last.tolist(), block_max.tolist(),
                    block_off.tolist(), data, pos_off, pos_data, pay_data,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "seg", "term", "df", "cf",
                "block_last", "block_max", "block_off", "data",
                "pos_off", "pos_data", "pay_data",
            ],
        )

    n_segments = max(
        int(np.ceil(n_docs_space / seg_size)),
        max(s.n_segments for s in seg_indexes),
    )
    groups = max(1, min(groups, n_segments))

    flags_pos_in = {s.has_positions for s in seg_indexes} - {None}
    flags_pay_in = {s.has_payloads for s in seg_indexes} - {None}
    # docvalues carry-through: columns packed by EVERY input generation
    # survive compaction (numeric streams merge element-wise over the
    # disjoint doc sets; ordinal streams remap to a merged dictionary).
    # Columns missing from any generation are dropped — recorded in the
    # manifest either way.
    vc_common = sorted(
        set.intersection(*(set(s.value_cols) for s in seg_indexes))
        if seg_indexes
        else set()
    )
    sc_common = sorted(
        set.intersection(*(set(s.string_cols) for s in seg_indexes))
        if seg_indexes
        else set()
    )
    st_common = sorted(
        set.intersection(*(set(s.store_cols) for s in seg_indexes))
        if seg_indexes
        else set()
    )
    # carry the docstore read schema, projected to the carried columns
    # (fetch_docs on the compacted index keeps its one-job point read)
    st_schema = None
    if st_common:
        src = next((s.store_schema for s in seg_indexes if s.store_schema), None)
        if src is not None:
            from pyspark.sql.types import _parse_datatype_string

            by_name = {f.name: f for f in _parse_datatype_string(src).fields}
            if all(c in by_name for c in ["doc_id", *st_common]):
                st_schema = ", ".join(
                    f"{c} {by_name[c].dataType.simpleString()}"
                    for c in ["doc_id", *st_common]
                )
    m = _read_manifest(out_path) if resume else None
    if m is None or m.get("codec_version") != CODEC_VERSION:
        os.makedirs(out_path, exist_ok=True)
        m = {
            "codec_version": CODEC_VERSION,
            "n_docs": n_docs,
            # doc ids are never renumbered: the id space keeps its
            # original extent even after deletions are purged (segment
            # layout + delete-by-id validation derive from this)
            "n_docs_space": n_docs_space,
            "n_purged": int(sum(len(v) for v in del_by_seg.values())),
            "avgdl": avgdl,
            "seg_size": seg_size,
            "n_segments": n_segments,
            "n_groups": groups,
            # propagate sub-stream presence so SegmentIndex.load of the
            # compacted dir agrees with the returned object (and later
            # compactions keep failing fast on mixed inputs)
            "has_positions": flags_pos_in.pop() if flags_pos_in else None,
            "has_payloads": flags_pay_in.pop() if flags_pay_in else None,
            "value_cols": vc_common,
            "string_cols": sc_common,
            "store_cols": st_common,
            "store_schema": st_schema,
            # carry the tokenizer contract (first input that recorded
            # one; generations built from one corpus share it)
            "tok_kwargs": next(
                (s.tok_kwargs for s in seg_indexes if s.tok_kwargs is not None),
                None,
            ),
            "completed_groups": [],
            "lineage": [],
        }
        _write_manifest(out_path, m)
    else:
        assert m["n_docs"] == n_docs and m["seg_size"] == seg_size, (
            "resume with different inputs — wipe the output dir"
        )
        # a pre-docvalues (or differently-configured) partial output
        # would resume with completed groups that lack the docvalues
        # files this run promises — the returned SegmentIndex would
        # claim streams that don't exist. Fail fast instead.
        assert (
            m.get("value_cols", []) == vc_common
            and m.get("string_cols", []) == sc_common
            and m.get("store_cols", []) == st_common
        ), (
            "resume with different carried docvalues/docstore columns — "
            "wipe the output dir (manifest "
            f"{m.get('value_cols', [])}/{m.get('string_cols', [])}/"
            f"{m.get('store_cols', [])} vs inputs "
            f"{vc_common}/{sc_common}/{st_common})"
        )
        groups = m["n_groups"]

    _all_done = set(m["completed_groups"]) == set(range(groups))
    # merged ordinal dictionaries + per-generation remap arrays: each
    # generation assigned its own ordinals; the compacted index needs
    # ONE dictionary, so build the union (sorted values, ords from 1)
    # and a facet-vocab-bounded old->new remap per (generation, col)
    remaps: dict[tuple[int, str], np.ndarray] = {}
    if sc_common and not (_all_done and m.get("string_dicts")):
        # skipped entirely on a fully-resumed dir: the remaps would
        # feed a group loop that has nothing left to do
        for col in sc_common:
            gen_dicts = []
            for si in seg_indexes:
                d = spark.read.parquet(
                    os.path.join(si.path, "docvalues_str", col, "dict")
                ).collect()
                gen_dicts.append({r["value"]: int(r["ord"]) for r in d})
            merged_vals = sorted(set().union(*(d.keys() for d in gen_dicts)))
            new_ord = {v: i + 1 for i, v in enumerate(merged_vals)}
            for gi, d in enumerate(gen_dicts):
                arr = np.zeros(max(d.values(), default=0) + 1, np.int64)
                for v, o in d.items():
                    arr[o] = new_ord[v]
                remaps[(gi, col)] = arr
            if not m.get("string_dicts"):
                spark.createDataFrame(
                    [(new_ord[v], v) for v in merged_vals], "ord long, value string"
                ).write.mode("overwrite").parquet(
                    os.path.join(out_path, "docvalues_str", col, "dict")
                )
        if not m.get("string_dicts"):
            m["string_dicts"] = True
            _write_manifest(out_path, m)

    def _merge_dense_factory(remap_by_gen: dict[int, np.ndarray] | None):
        def merge_dense(pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(pdf["seg"].iloc[0])
            d_lo = int(pdf["doc_lo"].iloc[0])
            n = int(pdf["n"].max())
            dense = np.zeros(n, np.int64)
            for _, r in pdf.iterrows():
                arr = _decode_doclens(r["data_dl"]).astype(np.int64)
                if remap_by_gen is not None:
                    # TOMBSTONE slots (an input that was itself
                    # compacted with deletions) survive the ordinal
                    # remap untouched
                    tomb = arr == TOMBSTONE
                    if tomb.any():
                        arr = np.where(tomb, 0, arr)
                        arr = remap_by_gen[int(r["gen"])][arr]
                        arr[tomb] = TOMBSTONE
                    else:
                        arr = remap_by_gen[int(r["gen"])][arr]
                # generations hold disjoint doc sets: absent docs hold
                # 0 in a generation's dense array, so max() is the union
                # (TOMBSTONE is the max of anything, so dead slots stay
                # dead across the union)
                dense[: len(arr)] = np.maximum(dense[: len(arr)], arr)
            del_ids = del_by_seg.get(seg)
            if del_ids is not None:
                idx = del_ids - d_lo
                idx = idx[(idx >= 0) & (idx < n)]
                # the tombstone stream is cleared by compaction; the
                # sentinel in the dense streams is what keeps match-all
                # / range / facet from resurrecting the doc
                dense[idx] = TOMBSTONE
            return pd.DataFrame(
                {
                    "seg": [seg],
                    "doc_lo": [d_lo],
                    "n": [n],
                    "dl_data": [varint_encode(dense.astype(np.uint64)).tobytes()],
                }
            )

        return merge_dense

    def _dv_streams(col: str, subdir: str) -> DataFrame:
        out = None
        for gi, si in enumerate(seg_indexes):
            base = (
                os.path.join(si.path, subdir, col)
                if subdir == "docvalues"
                else os.path.join(si.path, subdir, col, "streams")
            )
            d = (
                spark.read.option("basePath", base)
                .schema(DOCLEN_SCHEMA + ", group int")
                .parquet(base)
                .withColumn("gen", F.lit(gi))
            )
            out = d if out is None else out.unionByName(d)
        return out

    for g in range(groups):
        if g in m["completed_groups"]:
            continue
        t0 = time.time()
        # one Arrow group per SEGMENT (not per term): the inner pandas
        # groupby walks the terms — same shape as the single-pass encoder
        (
            posts.filter(F.col("seg") % groups == g)
            .groupBy("seg")
            .applyInPandas(
                lambda pdf: merge_postings(pdf), schema=POSTINGS_SCHEMA
            )
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(os.path.join(out_path, "postings", f"group={g}"))
        )
        (
            dls.filter(F.col("seg") % groups == g)
            .withColumnRenamed("dl_data", "data_dl")
            .groupBy("seg")
            # doclens merge IS the dense max-union (disjoint docs,
            # absent = 0) — same kernel as the docvalues streams
            .applyInPandas(_merge_dense_factory(None), schema=DOCLEN_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("seg")
            .parquet(os.path.join(out_path, "doclens", f"group={g}"))
        )
        for vc in vc_common:
            (
                _dv_streams(vc, "docvalues")
                .filter(F.col("seg") % groups == g)
                .withColumnRenamed("dl_data", "data_dl")
                .groupBy("seg")
                .applyInPandas(_merge_dense_factory(None), schema=DOCLEN_SCHEMA)
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(os.path.join(out_path, "docvalues", vc, f"group={g}"))
            )
        if st_common:
            # docstore rows carry through as-is (disjoint doc sets);
            # repartition+sort restores the one-file-per-seg, doc_id-
            # ordered layout fetch_docs' row-group pruning relies on
            st = None
            for si in seg_indexes:
                base = os.path.join(si.path, "docstore")
                d = (
                    spark.read.option("basePath", base)
                    .parquet(base)
                    .select("seg", "doc_id", *st_common)
                )
                st = d if st is None else st.unionByName(d)
            if del_by_seg:
                all_dead = [
                    int(x) for v in del_by_seg.values() for x in v
                ]
                if len(all_dead) <= 10_000:
                    st = st.filter(~F.col("doc_id").isin(all_dead))
                else:
                    # a delete_by_query near its cap would bloat the
                    # plan as an isin literal — broadcast anti-join
                    # keeps the purge a single map-side filter
                    dead_df = spark.createDataFrame(
                        [(i,) for i in all_dead], "doc_id long"
                    )
                    st = st.join(
                        F.broadcast(dead_df), "doc_id", "left_anti"
                    )
            (
                st.filter(F.col("seg") % groups == g)
                .repartition("seg")
                .sortWithinPartitions("seg", "doc_id")
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(os.path.join(out_path, "docstore", f"group={g}"))
            )

        for sc in sc_common:
            remap_by_gen = {
                gi: remaps[(gi, sc)] for gi in range(len(seg_indexes))
            }
            (
                _dv_streams(sc, "docvalues_str")
                .filter(F.col("seg") % groups == g)
                .withColumnRenamed("dl_data", "data_dl")
                .groupBy("seg")
                .applyInPandas(
                    _merge_dense_factory(remap_by_gen), schema=DOCLEN_SCHEMA
                )
                .write.mode("overwrite")
                .partitionBy("seg")
                .parquet(
                    os.path.join(
                        out_path, "docvalues_str", sc, "streams", f"group={g}"
                    )
                )
            )
        elapsed = time.time() - t0
        m["completed_groups"].append(g)
        m["lineage"].append(
            {
                "group": g,
                "compacted_from": [s.path for s in seg_indexes],
                "codec_version": CODEC_VERSION,
                "seconds": round(elapsed, 3),
            }
        )
        _write_manifest(out_path, m)

    if not m.get("termstats"):
        if del_by_seg:
            # deletions changed df: re-derive the sidecar from the
            # purged postings metadata (term, df, cf) — one
            # column-pruned job; only runs when tombstones were purged
            merged_terms = (
                spark.read.option(
                    "basePath", os.path.join(out_path, "postings")
                )
                .schema(POSTINGS_SCHEMA + ", group int")
                .parquet(os.path.join(out_path, "postings"))
                .select("term", "df", "cf")
            )
        else:
            # merged termstats sidecar: per-generation sidecars are
            # global for their generation; df/cf are additive over
            # disjoint doc sets. Pre-cf sidecars read cf as NULL; a
            # term with ANY NULL contribution keeps cf NULL ("unknown")
            # — sum() alone would skip the NULLs and serve a partial
            # count indistinguishable from a real total.
            merged_terms = None
            for si in seg_indexes:
                t = spark.read.parquet(os.path.join(si.path, "termstats"))
                if "cf" not in t.columns:
                    t = t.withColumn("cf", F.lit(None).cast("long"))
                merged_terms = (
                    t if merged_terms is None else merged_terms.unionByName(t)
                )
        (
            merged_terms.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.when(F.count(F.lit(1)) == F.count("cf"), F.sum("cf"))
                .otherwise(F.lit(None).cast("long"))
                .alias("cf"),
            )
            .repartitionByRange(max(2, groups), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(out_path, "termstats"))
        )
        m["termstats"] = True
        _write_manifest(out_path, m)

    flags_pos = {s.has_positions for s in seg_indexes} - {None}
    flags_pay = {s.has_payloads for s in seg_indexes} - {None}
    return SegmentIndex(
        path=out_path, n_docs=n_docs, avgdl=avgdl,
        n_segments=n_segments, seg_size=seg_size,
        has_positions=flags_pos.pop() if flags_pos else None,
        has_payloads=flags_pay.pop() if flags_pay else None,
        value_cols=tuple(vc_common),
        string_cols=tuple(sc_common),
        store_cols=tuple(st_common),
        store_schema=m.get("store_schema"),
        tok_kwargs=m.get("tok_kwargs"),
    )


def wand_phrase_search_multi(
    spark: SparkSession,
    seg_indexes: list[SegmentIndex],
    phrase_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
) -> DataFrame:
    """Quoted-phrase top-k across MULTIPLE packed generations (before
    compaction) with GLOBAL statistics — the phrase analogue of
    wand_search_multi: generation doc sets are disjoint, so each
    generation's segments run the positional intersection + member-term
    BM25 independently (with summed df and token-weighted avgdl) and
    the k-rows-per-segment partials merge globally. Identical to
    querying the compacted index (tests)."""
    term_list = sorted(set(phrase_terms))
    all_stats = [_sidecar_stats(si.path, term_list) for si in seg_indexes]
    dfs: dict[str, int] = {}
    for st in all_stats:
        if st is None:
            raise ValueError("phrase search needs the termstats sidecar")
        for t, (v, _c) in st.items():
            dfs[t] = dfs.get(t, 0) + int(v)
    if any(dfs.get(t, 0) == 0 for t in term_list):
        return empty_df(spark, "doc_id long, score double")
    n = sum(s.n_docs for s in seg_indexes)
    total_tokens = sum(s.avgdl * s.n_docs for s in seg_indexes)
    avgdl = total_tokens / n if n else 0.0
    est = _local_estimate(
        [(s, term_list) for s in seg_indexes], with_subs=True,
        stats_list=all_stats,
    )
    budget = _local_tier_budget()
    local = 0 < budget and est is not None and est <= budget
    unified = _unified_frame(
        spark, list(enumerate(seg_indexes)), term_list, with_subs=True,
        local=local,
    )
    if not local and est is not None and est > SINGLE_STAGE_MAX_BYTES:
        unified._spl_big_frame = True

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_phrase_topk(
            pdf, list(phrase_terms), dfs, k, k1, b, n, avgdl
        )

    if isinstance(unified, pd.DataFrame):
        return _local_topk_frame(
            spark, _kernel_pdf(unified, per_segment), k, round_to
        )
    seg_tops = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(seg_indexes), spark=spark,
    )
    return (
        seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def wand_search_multi(
    spark: SparkSession,
    seg_indexes: list[SegmentIndex],
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    sim=None,
    min_should_match: int = 1,
    boost_fn: tuple | None = None,
    after: tuple[float, int] | None = None,
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
        k=k, k1=k1, b=b, round_to=round_to, sim=sim,
        min_should_match=min_should_match, boost_fn=boost_fn,
        after=after,
    )


def wand_search(
    spark: SparkSession,
    seg_index: SegmentIndex,
    terms_boosts: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 5,
    sim=None,
    min_should_match: int = 1,
    boost_fn: tuple | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Distributed top-k over packed segments.

    Plan: term->df from the build-time sidecar (driver-side pyarrow,
    no job) -> parquet scan with term-isin pushdown (few rows per
    segment) -> per-segment pruned scoring in one Arrow batch ->
    global merge of n_segments*k rows (TakeOrderedAndProject): ONE
    Spark job. At 10^12 docs this is the query fast path: work per
    segment is bounded by the query's posting sizes, the merge is k
    rows per segment.

    ``sim``: any query.scorer.Similarity — plain BM25 takes the
    block-max pruned path; payload/classic/toggle variants run the
    exact per-segment scorer over the codec-v3 sub-streams,
    rank-identical to the flat path.

    ``min_should_match``: drop docs matching fewer than mm distinct
    query terms (BooleanQuery minShouldMatch; the reference's
    configurable mm, MoreLikeThis.java:147). mm>1 runs the exact
    per-segment scorer (counting clause matches requires every query
    term's postings regardless), rank-identical to the flat
    search_terms(min_should_match=mm).

    ``boost_fn``: (value_col, fn) — BoostedQuery at the serve tier
    (the flat handlers.boosted_search twin; MoreLikeThisHelper
    .java:131-145): fn is a vectorized np.ndarray -> np.ndarray
    ValueSource over ``value_col`` ("doc_id", or any column packed
    via build_segments(..., value_cols=[...])), multiplied into every
    candidate's score BEFORE ranking. Runs the exact per-segment
    scorer — an unbounded multiplier invalidates block-max bounds.
    ``after``: (score, doc_id) searchAfter cursor (Lucene
    IndexSearcher.searchAfter / Solr cursorMark) — return the k docs
    strictly after that position in (score desc, doc_id asc) order.
    The cursor filter runs INSIDE the per-segment kernel before its
    top-k cut, so every page costs k rows per segment at any depth —
    OFFSET paging would refetch offset+k rows per segment per page,
    the deep-paging anti-pattern at 10^12 docs. Cursor pages route to
    the exact scorer (the block-max heap prunes against the
    unfiltered top-k, which would drop page-2 docs).
    """
    return _wand_search_frames(
        spark, [(0, seg_index)], seg_index, terms_boosts,
        k=k, k1=k1, b=b, round_to=round_to, sim=sim,
        min_should_match=min_should_match, boost_fn=boost_fn,
        after=after,
    )


def _sidecar_stats(
    path: str, term_list: list[str]
) -> dict[str, tuple[int, int]] | None:
    """term -> (df, cf) from the build-time termstats sidecar, read
    driver-side with pyarrow (row-group pruning on the sorted term
    column) — no Spark job. None if the index predates the sidecar."""
    p = os.path.join(path, "termstats")
    if not path or not os.path.isdir(p):
        return None
    if not term_list:
        return {}
    import pyarrow.dataset as ds

    tbl = ds.dataset(p, format="parquet").to_table(
        columns=["term", "df", "cf"], filter=ds.field("term").isin(term_list)
    )
    return {
        t: (int(d), int(c))
        for t, d, c in zip(
            tbl["term"].to_pylist(),
            tbl["df"].to_pylist(),
            tbl["cf"].to_pylist(),
        )
    }


def _sidecar_dfs(path: str, term_list: list[str]) -> dict[str, int] | None:
    """term->df from the termstats sidecar (see _sidecar_stats)."""
    st = _sidecar_stats(path, term_list)
    if st is None:
        return None
    return {t: d for t, (d, _c) in st.items()}


def _unified_frame(
    spark: SparkSession,
    gens: list[tuple[int, SegmentIndex]],
    term_list: list[str],
    with_subs: bool = False,
    field: str = "",
    local: bool = False,
):
    """Postings (term-pruned scan) + doclen rows stacked into one frame
    keyed by seg, for a single groupBy(seg).applyInPandas stage.
    ``with_subs`` adds the v3 positions/payload sub-stream columns
    (left out of the plain-BM25 scan so parquet column pruning skips
    those bytes). ``field`` tags every row (fld column) so per-field
    packed indexes over the SAME doc space can stack into one frame —
    same seg covers the same doc range, so field routing stays
    segment-local (wand_boolean_search field_segments).

    ``local=True`` (byte budget pre-checked via _local_ok) returns the
    pandas twin assembled driver-side — the local serving tier."""
    if local:
        return _unified_pdf(gens, term_list, with_subs=with_subs, field=field)
    posts = None
    dls = None
    dels = None
    for gen_id, si in gens:
        # explicit schemas: the layout is fixed by the codec, and
        # schema inference would cost a footer-read job per query
        p = (
            spark.read.option("basePath", os.path.join(si.path, "postings"))
            .schema(POSTINGS_SCHEMA + ", group int")
            .parquet(os.path.join(si.path, "postings"))
            .filter(F.col("term").isin(term_list))
            # namespace segment ids per generation so groups don't collide
            .withColumn("seg", F.col("seg") + F.lit(gen_id * 1_000_000))
        )
        d = (
            spark.read.option("basePath", os.path.join(si.path, "doclens"))
            .schema(DOCLEN_SCHEMA + ", group int")
            .parquet(os.path.join(si.path, "doclens"))
            .withColumn("seg", F.col("seg") + F.lit(gen_id * 1_000_000))
        )
        posts = p if posts is None else posts.unionByName(p)
        dls = d if dls is None else dls.unionByName(d)
        # tombstone streams (delete_docs): _kind='del' rows ride the
        # same per-segment frame so every kernel sees its segment's
        # deletions in the same Arrow group — no extra join, no extra
        # job. Existence check is one driver-side stat call; absent dir
        # (the common case) costs nothing.
        if os.path.isdir(_deletes_dir(si.path)):
            t = (
                spark.read.schema(DOCLEN_SCHEMA)
                .parquet(_deletes_dir(si.path))
                .withColumn("seg", F.col("seg") + F.lit(gen_id * 1_000_000))
            )
            dels = t if dels is None else dels.unionByName(t)

    sub_cols = (
        [F.col("pos_off"), F.col("pos_data"), F.col("pay_data")] if with_subs else []
    )
    sub_nulls = (
        [
            F.lit(None).cast("array<long>").alias("pos_off"),
            F.lit(None).cast("binary").alias("pos_data"),
            F.lit(None).cast("binary").alias("pay_data"),
        ]
        if with_subs
        else []
    )
    out = posts.select(
        "seg",
        F.lit("post").alias("_kind"),
        F.lit(field).alias("fld"),
        "term",
        "df",
        "block_last",
        "block_max",
        "block_off",
        F.lit(None).cast("long").alias("doc_lo"),
        "data",
        *sub_cols,
    ).unionByName(
        dls.select(
            "seg",
            F.lit("dl").alias("_kind"),
            F.lit(field).alias("fld"),
            F.lit(None).cast("string").alias("term"),
            F.lit(None).cast("long").alias("df"),
            F.lit(None).cast("array<long>").alias("block_last"),
            F.lit(None).cast("array<int>").alias("block_max"),
            F.lit(None).cast("array<long>").alias("block_off"),
            "doc_lo",
            F.col("dl_data").alias("data"),
            *sub_nulls,
        )
    )
    if dels is not None:
        out = out.unionByName(
            dels.select(
                "seg",
                F.lit("del").alias("_kind"),
                F.lit(field).alias("fld"),
                F.lit(None).cast("string").alias("term"),
                F.lit(None).cast("long").alias("df"),
                F.lit(None).cast("array<long>").alias("block_last"),
                F.lit(None).cast("array<int>").alias("block_max"),
                F.lit(None).cast("array<long>").alias("block_off"),
                "doc_lo",
                F.col("dl_data").alias("data"),
                *sub_nulls,
            )
        )
    return out


def _dv_frame(
    spark: SparkSession,
    si: SegmentIndex,
    col: str,
    with_subs: bool,
    subdir: str = "docvalues",
    seg_offset: int = 0,
    local: bool = False,
):
    """Docvalues rows for one numeric/ordinal column, shaped like the
    unified frame (_kind='dv', term=column name, data=varint dense
    stream). ``seg_offset`` namespaces seg ids per generation, matching
    _unified_frame's gen_id*1e6 scheme. ``local=True`` returns the
    pandas twin (local serving tier)."""
    if local:
        return _dv_pdf(
            si, col, with_subs, subdir=subdir, seg_offset=seg_offset
        )
    base = (
        os.path.join(si.path, subdir, col)
        if subdir == "docvalues"
        else os.path.join(si.path, subdir, col, "streams")
    )
    dv = (
        spark.read.option("basePath", base)
        .schema(DOCLEN_SCHEMA + ", group int")
        .parquet(base)
    )
    sub_nulls = (
        [
            F.lit(None).cast("array<long>").alias("pos_off"),
            F.lit(None).cast("binary").alias("pos_data"),
            F.lit(None).cast("binary").alias("pay_data"),
        ]
        if with_subs
        else []
    )
    return dv.select(
        (F.col("seg") + F.lit(seg_offset)).alias("seg"),
        F.lit("dv").alias("_kind"),
        F.lit("").alias("fld"),
        F.lit(col).alias("term"),
        F.lit(None).cast("long").alias("df"),
        F.lit(None).cast("array<long>").alias("block_last"),
        F.lit(None).cast("array<int>").alias("block_max"),
        F.lit(None).cast("array<long>").alias("block_off"),
        "doc_lo",
        F.col("dl_data").alias("data"),
        *sub_nulls,
    )


def _gen_dfs(
    gens: list[tuple[int, SegmentIndex]], term_list: list[str], posts_fallback
) -> dict[str, int]:
    """Global df per query term: sum of each generation's sidecar
    (driver-side pyarrow, zero Spark jobs); falls back to one
    postings-metadata job for pre-sidecar indexes."""
    dfs: dict[str, int] | None = {}
    for _, si in gens:
        d = _sidecar_dfs(si.path, term_list)
        if d is None:
            dfs = None
            break
        for t, v in d.items():
            dfs[t] = dfs.get(t, 0) + int(v)
    if dfs is None:
        df_rows = posts_fallback().groupBy("term").agg(F.sum("df").alias("df")).collect()
        dfs = {r["term"]: int(r["df"]) for r in df_rows}
    return dfs


def _wand_search_frames(
    spark: SparkSession,
    gens: list[tuple[int, SegmentIndex]],
    stats: SegmentIndex,
    terms_boosts: list[tuple[str, float]],
    k: int,
    k1: float,
    b: float,
    round_to: int,
    sim=None,
    min_should_match: int = 1,
    boost_fn: tuple | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    term_list = sorted({t for t, _ in terms_boosts})
    boosts: dict[str, float] = {}
    for t, w in terms_boosts:
        boosts[t] = boosts.get(t, 0.0) + float(w)

    # the pruned block-max path is specialized to plain BM25 at mm=1;
    # other similarity variants (payload/classic/toggles), mm>1
    # (needs per-doc matched-clause counts, so every query term's
    # postings decode anyway), and boost_fn (an unbounded multiplier
    # invalidates the block-max upper bounds) run the exact
    # per-segment scorer over the v3 sub-streams
    # searchAfter also routes to the exact scorer: the block-max core
    # prunes against ITS OWN unfiltered top-k heap, which would drop
    # exactly the deeper docs a page-2 cursor needs
    plain_bm25 = min_should_match <= 1 and boost_fn is None and after is None and (
        sim is None
        or (
            sim.kind == "bm25"
            and sim.use_tf and sim.use_idf and sim.use_norm
            and not sim.use_payload
        )
    )
    # sub-stream columns only when the scorer will read them (payload
    # similarity) — parquet column pruning skips pos/pay bytes for
    # classic/toggle sims and the mm>1 BM25 path
    with_subs = sim is not None and sim.use_payload
    dv_dirs = [
        os.path.join(si.path, "docvalues", boost_fn[0])
        for _, si in gens
        if boost_fn is not None and boost_fn[0] != "doc_id"
    ]
    # ONE sidecar read feeds both the local-tier byte estimate and the
    # idf stats below (r07: the duplicate reads cost ~2x dataset
    # discovery per query)
    gen_stats = [_sidecar_stats(si.path, term_list) for _, si in gens]
    est = _local_estimate(
        [(si, term_list) for _, si in gens], with_subs, dv_dirs,
        stats_list=gen_stats,
    )
    budget = _local_tier_budget()
    local = 0 < budget and est is not None and est <= budget
    unified = _unified_frame(
        spark, gens, term_list, with_subs=with_subs, local=local
    )
    if boost_fn is not None and boost_fn[0] != "doc_id":
        value_col = boost_fn[0]
        for gen_id, si in gens:
            if value_col not in si.value_cols:
                raise ValueError(
                    f"boost_fn over {value_col!r} needs a docvalues "
                    "stream — rebuild with build_segments(..., "
                    f"value_cols=[{value_col!r}]) (doc_id is intrinsic)"
                )
            unified = _stack(
                unified,
                _dv_frame(
                    spark, si, value_col, with_subs,
                    seg_offset=gen_id * 1_000_000, local=local,
                ),
            )

    if all(st is not None for st in gen_stats):
        dfs = {}
        for st in gen_stats:
            for t, (d, _c) in st.items():
                dfs[t] = dfs.get(t, 0) + int(d)
    else:
        dfs = _gen_dfs(
            gens, term_list,
            lambda: _unified_frame(spark, gens, term_list).filter(
                F.col("_kind") == "post"
            ),
        )
    dfs = {t: d for t, d in dfs.items() if d > 0}
    if not dfs:
        return empty_df(spark, "doc_id long, score double")
    n = stats.n_docs
    avgdl = stats.avgdl

    if not local and est is not None and est > SINGLE_STAGE_MAX_BYTES:
        # big pruned frame: parallelize the kernels (exchange path)
        # instead of one serial coalesce(1) task
        unified._spl_big_frame = True

    if plain_bm25:
        if sim is not None:
            k1, b = sim.k1, sim.b
        idfs = {
            t: float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))
            for t, df in dfs.items()
        }

        def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            return _segment_topk(pdf, boosts, idfs, k, k1, b, avgdl)

    else:
        if sim is None:
            # mm>1 over plain BM25: the exact scorer needs a Similarity
            from ..query.scorer import Similarity

            sim = Similarity(kind="bm25", k1=k1, b=b)

        cursor = (
            (float(after[0]), int(after[1]), round_to)
            if after is not None
            else None
        )

        def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
            return _segment_topk_sim(
                pdf, boosts, dfs, k, sim, n, avgdl,
                min_should_match=min_should_match,
                boost_fn_spec=boost_fn,
                after=cursor,
            )

    if isinstance(unified, pd.DataFrame):
        # local tier: finalize driver-side (zero Spark jobs) — the
        # after re-check stays idempotent on the same exact rounding
        return _local_topk_frame(
            spark, _kernel_pdf(unified, per_segment), k, round_to,
            after=after,
        )
    seg_tops = _apply_per_segment(
        unified, per_segment, "doc_id long, score double",
        _n_segments_hint(*(si for _, si in gens)), spark=spark,
    )
    out = seg_tops.select("doc_id", F.round("score", round_to).alias("score"))
    if after is not None:
        # idempotent re-check on the Spark-rounded score (the kernel
        # already filtered on the numpy rounding of the same values)
        s_a, d_a = float(after[0]), int(after[1])
        out = out.filter(
            (F.col("score") < s_a)
            | ((F.col("score") == s_a) & (F.col("doc_id") > d_a))
        )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def describe_index(path: str) -> dict:
    """Driver-side index introspection (the SegmentInfos / Luke-style
    ops view): manifest stats, per-group build lineage, stream
    presence, and on-disk bytes per stream directory — pure filesystem
    reads, no Spark job. The dict is JSON-serializable for ops
    tooling and the query CLI."""
    m = _read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no packed index manifest under {path!r}")

    def _du(sub: str) -> int:
        total = 0
        root = os.path.join(path, sub)
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    streams = {
        name: _du(name)
        for name in (
            "postings", "doclens", "docstore", "docvalues",
            "docvalues_str", "termstats", "deletes",
        )
        if os.path.isdir(os.path.join(path, name))
    }
    n_deleted = (
        live_docs(path)["n_deleted"] if m.get("has_deletes") else 0
    )
    return {
        "n_deleted": n_deleted,
        "n_live": (m.get("n_docs") or 0) - n_deleted,
        "path": path,
        "codec_version": m.get("codec_version"),
        "n_docs": m.get("n_docs"),
        "avgdl": m.get("avgdl"),
        "n_segments": m.get("n_segments"),
        "seg_size": m.get("seg_size"),
        "complete": set(m.get("completed_groups", []))
        == set(range(m.get("n_groups", 0))),
        "has_positions": m.get("has_positions"),
        "has_payloads": m.get("has_payloads"),
        "value_cols": m.get("value_cols", []),
        "string_cols": m.get("string_cols", []),
        "store_cols": m.get("store_cols", []),
        "tok_kwargs": m.get("tok_kwargs"),
        "lineage": m.get("lineage", []),
        "stream_bytes": streams,
        "total_bytes": sum(streams.values()),
    }
