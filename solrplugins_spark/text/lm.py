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

from pyspark.sql import Column, DataFrame
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
