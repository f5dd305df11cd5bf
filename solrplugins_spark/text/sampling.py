"""Reproducible sampling + sequence packing for training pipelines.

- deterministic_sample / stratified_sample: hash-based Bernoulli
  sampling that is a pure function of (id, seed) — re-running the
  pipeline, changing partitioning, or adding executors never changes
  which rows are kept (unlike rand()-based sampling). The hash is
  md5-derived so oracles mirror it exactly.
- pack_sequences: assign docs to fixed-token-budget training sequences
  by cumulative token count in doc_id order — the sequence-packing
  step before tokenizer sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unit_hash(id_col: str, seed: int):
    """Uniform [0,1) from md5(seed:id) — first 8 hex chars / 2^32.
    Mirrored verbatim in DuckDB oracles."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def deterministic_sample(
    docs: DataFrame,
    rate: float,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows with unit_hash(id, seed) < rate — reproducible across
    runs/partitionings; expected fraction = rate. Pure column
    expression: no shuffle, no state."""
    return docs.filter(_unit_hash(id_col, seed) < rate)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    seed: int = 7,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum reproducible rates (e.g. language rebalancing:
    {'en': 0.1, 'fr': 1.0}); strata not listed keep ``default_rate``.
    Same hash per row regardless of stratum, so changing one stratum's
    rate never reshuffles another's sample."""
    rate_col = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate_col = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(
            rate_col
        )
    return docs.filter(_unit_hash(id_col, seed) < rate_col)


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int,
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, offset) — contiguous greedy packing:
    in ``id_col`` order, sequence s holds the docs whose cumulative
    token count falls in [s*seq_tokens, (s+1)*seq_tokens). offset =
    position of the doc's first token within its sequence.

    Expressed as a running total window. NOTE the single ordered
    window is the test-scale form; at 10^12 docs the same cumsum runs
    as per-range-partition sums + a tiny offsets pass (exactly
    builder.mint_doc_ids' two-pass trick — the math is identical, the
    window is swapped for mapInPandas + broadcast offsets)."""
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        (before / seq_tokens).cast("long").alias("seq_id"),
        (before % seq_tokens).alias("offset"),
    )
