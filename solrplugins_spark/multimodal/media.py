"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/frame-sample stages.

The container has no image/audio libraries, so the DECODE step is
stubbed (deterministic fake or NotImplementedError) — the Spark-side
plumbing (schema, partitioning, UDF signatures, batch shapes) is real
and tested. Swapping ``decoder='fake'`` for a real decoder (PIL,
torchaudio, ...) changes one function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media binary, mime string, width int, height int, "
    "duration_ms int, meta map<string,string>"
)


def media_table_from_docs(docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media table: bytes = utf-8 of the text
    (an opaque payload for plumbing tests), mime cycled."""
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(doc_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(doc_col).alias("media_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("media"),
        mime.alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoded pixels': sha256-seeded floats."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    x = np.arange(dim, dtype=np.uint64) + np.uint64(seed)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return ((x >> np.uint64(11)).astype(np.float64) / float(1 << 53)).astype(np.float32)


def decode_media(media: DataFrame, decoder: str = "fake", dim: int = 32) -> DataFrame:
    """(media_id, decoded: array<float>) — the decode stage.

    decoder='fake': deterministic hash-derived floats (plumbing-real,
    content-fake). decoder='real': NotImplementedError — no codec libs
    in this container (clearly-marked stub)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder != "fake":
                raise NotImplementedError(
                    "real media decoding needs PIL/torchaudio/ffmpeg — "
                    "not available in this container; use decoder='fake'"
                )
            vecs = [_fake_decode(b, dim) for b in pdf["media"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "decoded": vecs})

    return media.select("media_id", "media").mapInPandas(
        batches, schema="media_id long, decoded array<float>"
    )


def extract_features(media: DataFrame, decoder: str = "fake", dim: int = 32, n_features: int = 8) -> DataFrame:
    """(media_id, features: array<float>) — decode + pooled features
    (mean-pool blocks of the decoded signal; a real model slots in at
    the same batch shape)."""
    decoded = decode_media(media, decoder, dim)

    def pool(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                np.asarray(v, dtype=np.float32).reshape(n_features, -1).mean(axis=1)
                for v in pdf["decoded"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return decoded.mapInPandas(pool, schema="media_id long, features array<float>")


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """(media_id, frame_idx, offset_ms) — frame-sampling plan derived
    from duration metadata; pure column expressions (the decode of each
    frame would reuse decode_media per offset)."""
    n = (F.col("duration_ms") / every_ms).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("offset_ms", F.col("frame_idx") * every_ms)
