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

from pyspark.sql import DataFrame
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
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, offset) — contiguous greedy packing:
    in ``id_col`` order, sequence s holds the docs whose cumulative
    token count falls in [s*seq_tokens, (s+1)*seq_tokens). offset =
    position of the doc's first token within its sequence.

    Scale-safe global running total — NOT a single-partition window:
    range-repartition on the id, per-partition token sums collected
    (one tiny job, #partitions rows), cumulative offsets broadcast,
    then a partition-local cumsum in one Arrow pass — the
    builder.mint_doc_ids two-pass pattern applied to a running sum."""
    import numpy as np

    spark = docs.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    ordered = docs.repartitionByRange(p, F.col(id_col)).sortWithinPartitions(
        id_col
    )
    with_pid = ordered.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
    ).withColumn("_pid", F.spark_partition_id()).persist()
    sums = with_pid.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = acc
        acc += int(row["s"])
    b_offsets = spark.sparkContext.broadcast(offsets)

    def assign(batches):
        carry = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            nt = pdf["n_tokens"].to_numpy()
            before = (
                b_offsets.value[pid]
                + carry
                + np.concatenate([[0], np.cumsum(nt[:-1])])
            )
            carry += int(nt.sum())
            yield pdf.assign(
                seq_id=(before // seq_tokens).astype("int64"),
                offset=(before % seq_tokens).astype("int64"),
            )[["doc_id", "n_tokens", "seq_id", "offset"]]

    return with_pid.mapInPandas(
        assign, schema="doc_id long, n_tokens long, seq_id long, offset long"
    )
