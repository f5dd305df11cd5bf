"""Deterministic synthetic transcripts corpus.

BASELINE.json input_hint mandates the input shape:
(conv_id:string, turn_idx:int32, role:string, text:string,
 tool:string, ts:timestamp) — an Iceberg/parquet table of multi-turn
conversation / agent transcripts.

Generation is a pure function of the global turn number (seeded
numpy PCG64 keyed by row id block), so the corpus is identical
regardless of partitioning or parallelism — that property is what the
resumability and scaling tests lean on. Distributed via mapInPandas
over spark.range (no driver-side materialization), so the same code
generates 2k turns locally or 10^12 turns on a cluster.

Vocabulary is ~5k words with Zipfian frequencies (guarantees head-term
skew for the salting paths) plus planted rare terms with known df for
hand-checkable BM25 (FIXTURES.md §1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

VOCAB_SIZE = 5000
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "bash", "search", "python"])
BASE_TS = np.datetime64("2025-01-01T00:00:00")

# Planted rare terms: term -> (1-in-K turn selector). Deterministic:
# turn i contains plant p iff i % K_p == 7. Known df = ceil-ish n/K.
PLANTS = {"zephyrblade": 101, "quartzowl": 211, "embermoth": 401}


def _vocab() -> np.ndarray:
    """wNNNN vocabulary; ids 0..VOCAB_SIZE-1, rank==id (skewed head at 0)."""
    return np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])


_MAX_TOK = 30


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based RNG, pure per-element.

    Content is a function of the row id alone, so the corpus is
    byte-identical under any partitioning/parallelism (asserted by
    tests/test_index.py::test_corpus_deterministic_across_parallelism).
    """
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _u01(ids: np.ndarray, stream: int) -> np.ndarray:
    h = _mix(ids.astype(np.uint64) * np.uint64(0x100000001B3) + np.uint64(stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gen_block(start: int, count: int, turns_per_conv: int) -> pd.DataFrame:
    """Generate rows [start, start+count) — pure function of row ids."""
    ids = np.arange(start, start + count, dtype=np.int64)
    vocab = _vocab()

    conv = ids // turns_per_conv
    turn = (ids % turns_per_conv).astype(np.int32)
    # text length 3..30 tokens, ~2% empty strings
    n_tok = 3 + (_mix(ids.astype(np.uint64) + np.uint64(1)) % np.uint64(_MAX_TOK - 2)).astype(
        np.int64
    )
    empty = _u01(ids, 2) < 0.02
    # token ranks: power-law skew over the vocab (heavy head at rank 0)
    slot = ids.astype(np.uint64)[:, None] * np.uint64(_MAX_TOK) + np.arange(
        _MAX_TOK, dtype=np.uint64
    )
    u = (_mix(slot * np.uint64(0x9E3779B1) + np.uint64(3)) >> np.uint64(11)).astype(
        np.float64
    ) / float(1 << 53)
    ranks = np.minimum((VOCAB_SIZE * u**4).astype(np.int64), VOCAB_SIZE - 1)
    words = vocab[ranks]  # (count, _MAX_TOK)
    texts = []
    for j in range(count):
        if empty[j]:
            texts.append("")
            continue
        toks = list(words[j, : n_tok[j]])
        gid = int(ids[j])
        for plant, k in PLANTS.items():
            if gid % k == 7:
                toks.append(plant)
                if gid % (3 * k) == 7:  # occasional tf>1 for the plant
                    toks.append(plant)
        texts.append(" ".join(toks))
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv", np.char.zfill(conv.astype(str), 8)),
            "turn_idx": turn,
            "role": ROLES[ids % len(ROLES)],
            "text": texts,
            "tool": TOOLS[(_mix(ids.astype(np.uint64) + np.uint64(4)) % np.uint64(len(TOOLS))).astype(np.int64)],
            "ts": BASE_TS + ids * np.timedelta64(1, "s"),
        }
    )


def transcripts(
    spark: SparkSession,
    n_turns: int = 20_000,
    turns_per_conv: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table."""
    rng_rows = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids within a batch are contiguous for spark.range; handle
            # non-contiguity defensively by splitting on gaps.
            splits = np.split(ids, np.where(np.diff(ids) != 1)[0] + 1)
            for chunk in splits:
                yield _gen_block(int(chunk[0]), len(chunk), turns_per_conv)

    return rng_rows.mapInPandas(gen, schema=SCHEMA)


def transcripts_pandas(n_turns: int = 2_000, turns_per_conv: int = 20) -> pd.DataFrame:
    """Driver-side corpus for oracle tests — identical content."""
    return _gen_block(0, n_turns, turns_per_conv)
