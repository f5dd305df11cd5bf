"""N-gram language-model quality scoring (the CCNet / Wikipedia-LM
perplexity filter every large pretraining pipeline runs between
dedup and sampling: train a smoothed n-gram LM on a reference corpus,
score candidate documents by average token log-probability, and
bucket/filter on the score).

Design (all DataFrame ops, no UDFs):
- vocabulary: top-``vocab_size`` terms by (count desc, term asc) —
  the deterministic tie-break the oracle mirrors; everything else
  maps to ``<unk>`` (the standard open-vocabulary closure).
- model: add-k–smoothed bigram conditionals over the mapped stream,
    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k * (V+1))
  with c(w1) = sum_w2 c(w1,w2) (bigram-head counts, so the model is
  self-consistent) and V+1 the smoothing vocabulary incl. <unk>.
- score: lm_logp = avg over a doc's bigrams of ln P(w2|w1); docs with
  fewer than two tokens have no bigrams and drop out (documented).

Tokenizer grammar is the engine's ([a-z0-9]+ over lower()), so LM
scores live in the same token space as the index.

Scale shape (100 TB): bigram construction is a per-row array
transform (zero shuffles — no window, no positional self-join);
vocab (<= V rows) and head counts (<= V+1 rows) broadcast; the one
real shuffle is the bigram-count groupBy and the (w1, w2) model
equi-join, both key-partitioned and AQE-skew-splittable (hot
stopword heads split at runtime).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

UNK = "<unk>"


def _token_array(text_col: str) -> Column:
    """Ordered token array under the engine grammar. Splitting on
    runs of non-alphanumerics leaves empties only at the ends —
    filter keeps interior adjacency intact."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair, built inside
    the token array (slice + transform + element_at): zero shuffles,
    no per-row Python."""
    tk = _token_array(text_col)
    pairs = F.transform(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda t, i: F.struct(t.alias("w1"), F.element_at(tk, i + 2).alias("w2")),
    )
    return (
        docs.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def _map_unk(bg: DataFrame, vocab: DataFrame, id_col: str) -> DataFrame:
    """Map both pair slots through the vocabulary (OOV -> <unk>) via
    two broadcast left joins — never a literal map, so the vocabulary
    can be web-scale (~1M terms) without blowing up the plan."""
    v1 = vocab.select(F.col("term").alias("w1"), F.lit(True).alias("_v1"))
    v2 = vocab.select(F.col("term").alias("w2"), F.lit(True).alias("_v2"))
    return (
        bg.join(F.broadcast(v1), "w1", "left")
        .join(F.broadcast(v2), "w2", "left")
        .select(
            id_col,
            F.when(F.col("_v1").isNotNull(), F.col("w1")).otherwise(UNK).alias("w1"),
            F.when(F.col("_v2").isNotNull(), F.col("w2")).otherwise(UNK).alias("w2"),
        )
    )


@dataclass(frozen=True)
class BigramLM:
    """Trained model: tiny broadcastable vocab/head frames + the
    bigram count table (the only potentially-large piece)."""

    vocab: DataFrame  # (term)                 <= vocab_size rows
    heads: DataFrame  # (w1, c1)               <= vocab_size+1 rows
    bigrams: DataFrame  # (w1, w2, c2)
    vocab_size: int  # configured cap
    n_vocab: int  # REALIZED vocab size (<= cap; the smoothing V)
    add_k: float


def train_bigram_lm(
    ref_docs: DataFrame,
    vocab_size: int = 1000,
    add_k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> BigramLM:
    """Fit the smoothed bigram LM on a reference corpus (CCNet trains
    on Wikipedia; the gate self-trains for determinism)."""
    toks = ref_docs.select(F.explode(_token_array(text_col)).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(int(vocab_size))
        .select("term")
    )
    vocab = vocab.persist()
    # realized vocab may be smaller than the cap on small/narrow
    # corpora; add-k smooths over the ACTUAL event space (V+1 with
    # <unk>), not the configured ceiling. One job over <= V rows.
    n_vocab = vocab.count()
    bg = _map_unk(_bigrams(ref_docs, text_col, id_col), vocab, id_col)
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return BigramLM(
        vocab=vocab,
        heads=c1,
        bigrams=c2,
        vocab_size=int(vocab_size),
        n_vocab=int(n_vocab),
        add_k=float(add_k),
    )


def score_bigram_lm(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 5,
) -> DataFrame:
    """(id, n_bigrams, lm_logp) — average bigram log-probability per
    document under ``lm``. Unseen pairs smooth to k/(c1 + k(V+1));
    unseen heads to 1/(V+1) (the add-k floor). Docs with < 2 tokens
    have no bigrams and are absent (score undefined, not zero)."""
    k = lm.add_k
    v_smooth = float(lm.n_vocab + 1)
    bg = _map_unk(_bigrams(docs, text_col, id_col), lm.vocab, id_col)
    scored = (
        bg.join(lm.bigrams, ["w1", "w2"], "left")
        .join(F.broadcast(lm.heads), "w1", "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0.0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(k * v_smooth))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), round_to).alias("lm_logp"),
    )


def ppl_bucket(
    scored: DataFrame,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    score_col: str = "lm_logp",
    by: str | None = None,
    sample_cap: int | None = None,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's perplexity split (head/middle/tail per language): label
    every row with the quantile bucket of its LM score within its
    ``by`` group (or globally when ``by`` is None).

    Threshold rule (deterministic, interpolation-free): for each
    fraction p, the threshold is the k-th SMALLEST score with
    k = ceil(p * n) — an actual data value, never an interpolated
    mean, so the DuckDB oracle mirrors it exactly via row_number.
    Buckets ascend in score: bucket 0 = scores <= t_1 (lowest
    log-prob = HIGHEST perplexity = CCNet's "tail"), the last bucket
    = highest log-prob = "head". Ties on the threshold value all land
    in the lower bucket (value comparison, not rank comparison).

    Scale shape: bucketing itself never sorts — thresholds come from
    one groupBy collect over the 2-column (group, score) projection,
    broadcast back, and buckets are pure CASE comparisons. At 100 TB
    pass ``sample_cap`` (CCNet itself fits thresholds on a sample):
    the cap ranks the deterministic unit-hash inside each group over
    that same narrow projection, so the full documents never sort and
    the threshold basis is rerun/partitioning-invariant.
    """
    fr = sorted(float(p) for p in fractions)
    if not fr or fr[0] <= 0.0 or fr[-1] >= 1.0:
        raise ValueError("fractions must be strictly inside (0, 1)")
    group = [by] if by else []
    basis = scored
    if sample_cap is not None:
        # deterministic per-row cap: keep the sample_cap smallest
        # unit-hashes per group (re-uses the sampling module's
        # md5-derived hash so the threshold basis is partition- and
        # rerun-invariant)
        from .sampling import _unit_hash

        w = Window.partitionBy(*group).orderBy("_u", id_col)
        basis = (
            scored.withColumn("_u", _unit_hash(id_col, seed))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(sample_cap))
            .drop("_u", "_rn")
        )
    arr = F.array_sort(F.collect_list(F.col(score_col).cast("double")))
    th = basis.groupBy(*group).agg(arr.alias("_scores"))
    sel = group + [
        F.element_at(
            "_scores",
            F.ceil(F.size("_scores") * F.lit(p)).cast("int"),
        ).alias(f"_t{i}")
        for i, p in enumerate(fr)
    ]
    th = th.select(*sel)
    out = (
        scored.join(F.broadcast(th), on=group) if group
        else scored.crossJoin(F.broadcast(th))
    )
    bucket = F.lit(len(fr))  # default: above every threshold
    for i in range(len(fr) - 1, -1, -1):
        bucket = F.when(
            F.col(score_col) <= F.col(f"_t{i}"), F.lit(i)
        ).otherwise(bucket)
    return out.withColumn("bucket", bucket).drop(
        *[f"_t{i}" for i in range(len(fr))]
    )
