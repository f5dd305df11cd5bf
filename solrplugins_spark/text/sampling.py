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


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — sliding-window chunking of
    long documents into training windows: chunk c covers tokens
    [c*stride, c*stride + max_tokens) with stride = max_tokens -
    overlap, so consecutive chunks share ``overlap`` tokens (the
    context-continuity trick for long-document pretraining). The last
    chunk may be shorter; a chunk is only emitted if it contributes at
    least one NEW token (start < n_tokens - overlap, or start == 0),
    so a short doc yields exactly one chunk and nothing is emitted
    twice. Token-less docs yield no rows.

    Pure column expressions (sequence + explode + slice + array_join):
    no shuffle, no UDF — the explode multiplies rows ~n/stride, which
    is the output size itself."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap {overlap} must be < max_tokens {max_tokens}")
    from ..analysis.tokenizer import tokens_col

    stride = max_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size("_toks")
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        docs.select(F.col(doc_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            "doc_id",
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens).alias("_c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("_c").cast("long").alias("n_tokens"),
            F.array_join("_c", " ").alias("chunk"),
        )
    )


def epoch_shard(
    docs: DataFrame,
    n_shards: int,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, sort_key) — deterministic per-epoch shuffling
    for training: every doc gets a shard in [0, n_shards) and a
    within-shard order key, both pure functions of (id, epoch) — a
    different epoch reshuffles everything, re-running the same epoch
    (any partitioning, any cluster size) reproduces the exact order.
    The md5-derived key is oracle-mirrorable; consumers
    ``repartition(n_shards, "shard").sortWithinPartitions("sort_key")``
    to materialize the epoch — one shuffle, no global sort."""
    h = F.md5(
        F.concat(F.lit(f"e{int(epoch)}:"), F.col(id_col).cast("string"))
    )
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(key, F.lit(int(n_shards))).cast("long").alias("shard"),
        key.alias("sort_key"),
    )


def mixture_rates(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
) -> dict[str, float]:
    """Per-stratum keep-rates that realize a target mixture by
    DOWN-sampling only (The Pile / DoReMi-style source re-weighting
    without replication): given target proportions ``weights``, find
    the largest total T with T*w_s <= n_s for every stratum s, and
    keep rate r_s = T*w_s / n_s. The binding stratum (the one that
    pins T) keeps rate 1.0; every other stratum is thinned to match.
    Strata absent from ``weights`` get rate 0.0 (dropped).

    One count(*) groupBy over the strata column (tiny output: one row
    per stratum) — the only job; the math is driver-side over that
    bounded frame.
    """
    w = {k: float(v) for k, v in weights.items()}
    tot = sum(w.values())
    if tot <= 0:
        raise ValueError("weights must sum to a positive value")
    w = {k: v / tot for k, v in w.items()}
    counts = {
        r[strata_col]: int(r["n"])
        for r in docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[strata_col] in w
    }
    missing = [k for k in w if k not in counts or counts[k] == 0]
    if missing:
        raise ValueError(f"strata with target weight but no rows: {missing}")
    t = min(counts[k] / w[k] for k in w if w[k] > 0)
    return {k: (t * w[k] / counts[k]) if w[k] > 0 else 0.0 for k in w}


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample every stratum so the EXPECTED output mixture equals
    ``weights`` (normalized), maximizing retained data: the scarcest
    stratum relative to its target keeps everything, the rest thin via
    the deterministic unit-hash (partition/rerun-invariant, like
    deterministic_sample). Strata not in ``weights`` are dropped.

    Scale shape: one tiny strata-count agg, then a pure hash-filter
    column expression — no shuffle of the data itself.
    """
    rates = mixture_rates(docs, weights, strata_col)
    return stratified_sample(
        docs, rates, strata_col, seed=seed, id_col=id_col, default_rate=0.0
    )


def cap_per_stratum(
    docs: DataFrame,
    cap: int,
    strata_col: str = "source",
    seed: int = 7,
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the per-domain cap of
    MassiveText / RefinedWeb-style curation (a handful of head domains
    would otherwise dominate the corpus; mixture_sample rebalances by
    RATE, this enforces an exact COUNT ceiling). Survivors are the
    ``cap`` lowest md5(seed:id) hashes per stratum, so the choice is a
    pure function of (id, seed): rerunning, repartitioning, or growing
    the cluster never changes which rows survive, and the hash order
    is mirrored verbatim in DuckDB oracles.

    Scale shape: exact salted two-phase top-cap. Phase 1 ranks within
    (stratum, salt) — a head domain holding 1% of a 100-TB corpus
    splits across ``salts`` rank groups instead of funnelling into one
    task's sort. Phase 2 ranks the <= salts*cap phase-1 survivors per
    stratum — bounded input regardless of corpus size. The union of
    per-salt lowest-cap sets contains the global lowest-cap set, so
    the two-phase result is exact, not approximate. Strata with fewer
    than ``cap`` rows keep everything.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"cap{int(seed)}:"), F.col(id_col).cast("string")))
    salt = F.pmod(
        F.conv(F.substring(h, 17, 8), 16, 10).cast("long"), F.lit(int(salts))
    )
    staged = docs.withColumn("_h", h).withColumn("_salt", salt)
    partial = Window.partitionBy(strata_col, "_salt").orderBy("_h", id_col)
    final = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        staged.withColumn("_rn", F.row_number().over(partial))
        .filter(F.col("_rn") <= cap)
        .withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= cap)
        .drop("_h", "_salt", "_rn")
    )
