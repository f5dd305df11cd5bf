"""Incremental (streaming) index build + payload scoring tests."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solrplugins_spark.analysis.payloads import (
    build_payload_index,
    parse_payload_tokens,
)
from solrplugins_spark.corpus import transcripts_pandas
from solrplugins_spark.index.builder import build_index
from solrplugins_spark.query.scorer import (
    PayloadIdf,
    PayloadOnly,
    search_terms,
)
from solrplugins_spark.streaming import (
    incremental_index_build,
    merge_segment_stats,
)


def test_parse_payload_tokens():
    assert parse_payload_tokens("java^2.0 sql^0.5 ruby") == [
        ("java", 2.0), ("sql", 0.5), ("ruby", 1.0),
    ]
    assert parse_payload_tokens("") == []
    assert parse_payload_tokens("x^notanumber") == [("x^notanumber", 1.0)]


def test_payload_only_scoring(spark):
    rows = [
        (0, "java^2.0 java^4.0 sql^0.5"),
        (1, "java^1.0"),
        (2, "sql^3.0 ruby"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_payload_index(docs)
    got = search_terms(idx, [("java", 1.0)], k=10, sim=PayloadOnly).toPandas()
    scores = dict(zip(got["doc_id"], got["score"]))
    # avg payload: doc0 (2+4)/2=3.0, doc1 1.0
    assert scores == {0: 3.0, 1: 1.0}
    # boost multiplies the payload score
    got2 = search_terms(idx, [("java", 2.0)], k=10, sim=PayloadOnly).toPandas()
    assert dict(zip(got2["doc_id"], got2["score"])) == {0: 6.0, 1: 2.0}


def test_payload_idf_scoring(spark):
    import math

    rows = [(0, "java^2.0"), (1, "java^1.0"), (2, "sql^3.0")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_payload_index(docs)
    got = search_terms(idx, [("java", 1.0)], k=10, sim=PayloadIdf).toPandas()
    idf = math.log(3 / (2 + 1.0)) + 1.0  # classic idf, df=2, N=3
    scores = dict(zip(got["doc_id"], got["score"]))
    assert abs(scores[0] - round(2.0 * idf, 5)) < 1e-6
    assert abs(scores[1] - round(1.0 * idf, 5)) < 1e-6


def test_generation_commit_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a committed batch_id
    must not append a second manifest line (n_docs/avgdl would inflate
    at compaction)."""
    from solrplugins_spark.streaming import process_generation

    out = str(tmp_path / "inc")
    os.makedirs(out)
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    assert process_generation(docs, 0, out) is True
    assert process_generation(docs, 0, out) is False  # replay -> skip
    manifest = os.path.join(out, "stream_manifest.jsonl")
    with open(manifest) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 1 and lines[0]["generation"] == 0
    assert lines[0]["docs"] == 2
    # a new generation still commits
    assert process_generation(docs, 1, out) is True
    with open(manifest) as f:
        assert sum(1 for line in f if line.strip()) == 2


def test_incremental_build_matches_batch(spark, tmp_path):
    """Stream 3 file chunks -> merged term stats identical to one batch
    build; manifest carries per-generation lineage + throughput."""
    src = tmp_path / "src"
    src.mkdir()
    pdf = transcripts_pandas(600)
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    for i in range(3):
        chunk = spark.createDataFrame(pdf.iloc[i * 200 : (i + 1) * 200])
        chunk.coalesce(1).write.mode("overwrite").parquet(str(src / f"chunk{i}"))

    out = str(tmp_path / "inc_idx")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "chunk0")).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "chunk*"))
    )
    q = incremental_index_build(stream, out, ckpt)
    q.awaitTermination(120)

    merged = merge_segment_stats(spark, out).orderBy("term").toPandas()
    batch = (
        build_index(spark.createDataFrame(pdf))
        .terms.orderBy("term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        merged.astype({"df": "int64", "cf": "int64"}),
        batch.astype({"df": "int64", "cf": "int64"}),
        check_dtype=False,
    )
    with open(os.path.join(out, "stream_manifest.jsonl")) as f:
        gens = [json.loads(line) for line in f]
    assert sum(g["docs"] for g in gens) == 600
    assert all(g["docs_per_sec"] > 0 for g in gens)

    # resumability: restarting with the same checkpoint adds nothing
    stream2 = (
        spark.readStream.schema(spark.read.parquet(str(src / "chunk0")).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "chunk*"))
    )
    q2 = incremental_index_build(stream2, out, ckpt)
    q2.awaitTermination(60)
    with open(os.path.join(out, "stream_manifest.jsonl")) as f:
        gens2 = [json.loads(line) for line in f]
    assert sum(g["docs"] for g in gens2) == 600


def test_compaction_matches_batch_segments(spark, tmp_path):
    """Streamed generations compacted into packed segments answer
    queries identically to a from-scratch batch segment build."""
    from solrplugins_spark.index.segments import build_segments, wand_search
    from solrplugins_spark.streaming.incremental import compact_generations

    src = tmp_path / "src2"
    src.mkdir()
    pdf = transcripts_pandas(600)
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    for i in range(3):
        spark.createDataFrame(pdf.iloc[i * 200 : (i + 1) * 200]).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / f"c{i}"))
    inc = str(tmp_path / "inc2")
    q = incremental_index_build(
        spark.readStream.schema(spark.read.parquet(str(src / "c0")).schema)
        .option("maxFilesPerTrigger", "1").parquet(str(src / "c*")),
        inc, str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)

    compacted = compact_generations(spark, inc, str(tmp_path / "seg_inc"), seg_size=64, groups=2)
    batch_idx = build_index(spark.createDataFrame(pdf))
    batch_seg = build_segments(batch_idx, str(tmp_path / "seg_batch"), seg_size=64, groups=2)

    assert compacted.n_docs == batch_seg.n_docs
    assert abs(compacted.avgdl - batch_seg.avgdl) < 1e-9
    for terms in ([("zephyrblade", 1.0)], [("w0000", 2.0), ("w0005", 1.0)]):
        a = wand_search(spark, compacted, terms, k=10).toPandas()
        b = wand_search(spark, batch_seg, terms, k=10).toPandas()
        pd.testing.assert_frame_equal(a, b)


def test_streamed_positions_phrase_after_compaction(spark, tmp_path):
    """Streamed generations built with positions=True -> compaction
    produces a codec-v3 packed index that answers PHRASE queries
    identically to a from-scratch positional batch build."""
    import numpy as np

    from solrplugins_spark.index.segments import build_segments, wand_phrase_search
    from solrplugins_spark.query.compiler import execute_query
    from solrplugins_spark.streaming import process_generation
    from solrplugins_spark.streaming.incremental import compact_generations

    pdf = transcripts_pandas(400)
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    out = str(tmp_path / "inc")
    os.makedirs(out)
    for i in range(2):
        chunk = spark.createDataFrame(pdf.iloc[i * 200 : (i + 1) * 200])
        assert process_generation(chunk, i, out, positions=True)

    seg = compact_generations(spark, out, str(tmp_path / "packed"), seg_size=128)
    phrase = pdf.iloc[0]["text"].lower().split()[:2]
    packed = wand_phrase_search(spark, seg, phrase, k=10).toPandas()

    batch_idx = build_index(spark.createDataFrame(pdf), positions=True)
    flat = execute_query(batch_idx, f'"{phrase[0]} {phrase[1]}"', k=10).toPandas()
    assert len(flat) > 0
    assert list(packed["doc_id"]) == list(flat["doc_id"])
    assert np.allclose(packed["score"], flat["score"], atol=1e-5)


def test_streamed_generations_serve_packed_before_compaction(spark, tmp_path):
    """The full streaming->serving loop with NO compaction step:
    readStream chunks -> process_generation(pack=True) packs each
    microbatch into servable segments -> packed_generations() feeds
    the multi-generation /select and /uf surfaces directly — results
    identical to a from-scratch batch build. This is the at-scale
    ingest story: a committed microbatch is queryable immediately."""
    import numpy as np

    from solrplugins_spark.index.builder import build_index
    from solrplugins_spark.index.segments import build_segments
    from solrplugins_spark.query.handlers import (
        packed_feedback_handler,
        packed_select_handler,
    )
    from solrplugins_spark.query.mlt import MLTParams
    from solrplugins_spark.streaming import (
        incremental_index_build,
        packed_generations,
    )

    src = tmp_path / "src"
    src.mkdir()
    pdf = transcripts_pandas(600)
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pdf["doc_id"] = pdf.index.astype("int64")
    for i in range(3):
        chunk = spark.createDataFrame(pdf.iloc[i * 200 : (i + 1) * 200])
        chunk.coalesce(1).write.mode("overwrite").parquet(str(src / f"chunk{i}"))

    out = str(tmp_path / "inc_pack")
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "chunk0")).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "chunk*"))
    )
    q = incremental_index_build(
        stream, out, str(tmp_path / "ckpt_pack"),
        pack=True, seg_size=64, seg_groups=2, store_cols=["text", "role"],
    )
    q.awaitTermination(180)

    gens = packed_generations(out)
    assert len(gens) == 3
    assert all(g.store_cols == ("role", "text") for g in gens)

    batch = build_segments(
        build_index(spark.createDataFrame(pdf)), str(tmp_path / "batch_pack"),
        seg_size=64, groups=2, store_cols=["text", "role"],
    )
    toks = pdf.iloc[0]["text"].lower().split()
    query = f"{toks[0]} and not {toks[1]} or {toks[2]}"
    got = packed_select_handler(spark, gens, query, k=6)["docs"].toPandas()
    want = packed_select_handler(spark, batch, query, k=6)["docs"].toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["score"], want["score"], atol=1e-9)
    assert list(got["text"]) == list(want["text"])

    params = MLTParams(min_term_freq=1, min_doc_freq=2, max_query_terms=10)
    gf = packed_feedback_handler(spark, gens, toks[0], params, k=8)["docs"].toPandas()
    wf = packed_feedback_handler(spark, batch, toks[0], params, k=8)["docs"].toPandas()
    assert list(gf["doc_id"]) == list(wf["doc_id"])
    assert np.allclose(gf["score"], wf["score"], atol=1e-9)
