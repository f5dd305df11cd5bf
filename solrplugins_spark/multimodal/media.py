"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/frame-sample stages.

Decode support is honest about the container: formats decodable with
the STANDARD LIBRARY decode for real — WAV PCM audio (the ``wave``
module; 8/16/32-bit, multi-channel downmix) and binary PGM/PPM images
(pure header+bytes parsing) — while compressed codecs (PNG/JPEG/MP3/
MP4) raise NotImplementedError because no codec libraries exist here;
swapping in PIL/torchaudio/ffmpeg changes one dispatch entry, not the
plan. ``decoder='fake'`` keeps the deterministic hash-derived payload
for plumbing tests. Schema, partitioning, UDF signatures and batch
shapes are identical across fake and real paths.
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


def _decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV PCM decode via the stdlib ``wave`` module: 8/16/32-bit
    samples normalized to [-1, 1) float32, channels downmixed by
    mean."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.float32)


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Real binary PGM (P5, grayscale) / PPM (P6, RGB) decode: header
    token parse (with # comments) + raw pixel bytes, normalized to
    [0, 1] float32; RGB reduced to mean luminance."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval, then raw data
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("2-byte PNM samples unsupported")
    n = w * h * (3 if magic == b"P6" else 1)
    px = np.frombuffer(payload[i : i + n], "u1").astype(np.float32) / float(maxval)
    if magic == b"P6":
        px = px.reshape(-1, 3).mean(axis=1)
    return px.astype(np.float32)


def _real_decode(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch for the stdlib-decodable formats; honest
    NotImplementedError for compressed codecs (no libs here)."""
    b = payload or b""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _decode_wav(b)
    if b[:2] in (b"P5", b"P6"):
        return _decode_pnm(b)
    raise NotImplementedError(
        "real decode supports WAV PCM and binary PGM/PPM (stdlib); "
        "compressed codecs (PNG/JPEG/MP3/MP4) need PIL/torchaudio/"
        f"ffmpeg — not in this container (payload starts {b[:8]!r})"
    )


def decode_media(media: DataFrame, decoder: str = "fake", dim: int = 32) -> DataFrame:
    """(media_id, decoded: array<float>) — the decode stage.

    decoder='fake': deterministic hash-derived floats (plumbing-real,
    content-fake; fixed ``dim``). decoder='real': actual decoding for
    WAV PCM and binary PGM/PPM via the standard library (variable
    length = the true signal); compressed codecs raise
    NotImplementedError until a codec library is installed."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "fake":
                vecs = [_fake_decode(b, dim) for b in pdf["media"]]
            else:
                vecs = [_real_decode(b) for b in pdf["media"]]
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
        def one(v) -> np.ndarray:
            x = np.asarray(v, dtype=np.float32)
            if len(x) == 0:
                # zero-frame WAV / zero-pixel PNM: zeros, not the
                # silent all-NaN mean-of-empty would produce
                return np.zeros(n_features, dtype=np.float32)
            pad = (-len(x)) % n_features  # real decodes are variable-length
            if pad:
                x = np.pad(x, (0, pad), mode="edge")
            return x.reshape(n_features, -1).mean(axis=1)

        for pdf in it:
            feats = [one(v) for v in pdf["decoded"]]
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


def synth_wav_bytes(
    n_samples: int = 1600, freq: float = 440.0, rate: int = 16000,
    amplitude: float = 0.5,
) -> bytes:
    """Deterministic 16-bit mono PCM WAV (a sine) built with the
    stdlib ``wave`` writer — a REAL payload for the real decode path;
    no external data, no randomness."""
    import io
    import wave

    t = np.arange(n_samples, dtype=np.float64) / rate
    x = (amplitude * np.sin(2 * np.pi * freq * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def synth_pgm_bytes(width: int = 8, height: int = 8) -> bytes:
    """Deterministic binary PGM (P5) gradient image."""
    px = (
        (np.arange(width * height, dtype=np.int64) * 255) // max(width * height - 1, 1)
    ).astype("u1")
    return f"P5\n# synthetic\n{width} {height}\n255\n".encode() + px.tobytes()
