"""The CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") composed
end-to-end from the engine's own operators:

  1. paragraph-level exact dedup         (dedup/dedup.py dedup_lines)
  2. language identification             (text/analysis.py language_id)
  3. per-language LM perplexity buckets  (text/lm.py train/score/bucket)

Each stage keeps its own documented scale shape (hash-agg dedup with
AQE skew-split, zero-shuffle stopword scoring, broadcast LM closure +
collected-threshold bucketing) — the composition adds NO new shuffle
beyond the stages' own; documents flow straight through as one
DataFrame lineage, so Catalyst pipelines the language filter into the
LM scoring scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import dedup_lines
from .analysis import language_id
from .lm import ppl_bucket, score_bigram_lm, train_bigram_lm


def ccnet_pipeline(
    docs: DataFrame,
    lm_ref: DataFrame | None = None,
    vocab_size: int = 1000,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    min_chars: int = 1,
    sep: str = "\n",
    sample_cap: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text, n_kept, lang_pred, n_bigrams, lm_logp, bucket):
    every input doc with its paragraph-deduplicated text, predicted
    language, average bigram log-prob under a per-run LM, and its
    head/middle/tail perplexity bucket WITHIN its language (CCNet's
    split: bucket 0 = highest perplexity = "tail", last = "head").

    ``lm_ref`` is the reference corpus the LM trains on (CCNet uses
    Wikipedia); by default it self-trains on the deduplicated corpus.
    Docs whose deduped text has < 2 tokens carry NULL lm_logp /
    n_bigrams / bucket (perplexity undefined — the caller's quality
    gate decides, exactly like score_bigram_lm's absence rule)."""
    dd = dedup_lines(docs, min_chars=min_chars, sep=sep, text_col=text_col)
    tagged = language_id(dd, text_col=text_col)
    ref = lm_ref if lm_ref is not None else tagged
    lm = train_bigram_lm(ref, vocab_size=vocab_size, text_col=text_col)
    scored = score_bigram_lm(tagged, lm, text_col=text_col)
    lang_map = tagged.select("doc_id", "lang_pred")
    buckets = ppl_bucket(
        scored.join(lang_map, "doc_id"),
        fractions=fractions,
        by="lang_pred",
        sample_cap=sample_cap,
    )
    # UNORDERED on purpose (r07): the trailing .orderBy("doc_id") this
    # returned through r06 imposed a full-corpus global sort on every
    # caller for presentation only — at 100 TB that is a corpus-wide
    # range exchange buying nothing. Callers that need an order (the
    # oracle gate does) sort their own bounded output.
    return tagged.join(
        buckets.select("doc_id", "n_bigrams", "lm_logp", "bucket"),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        text_col,
        "n_kept",
        "lang_pred",
        "n_bigrams",
        "lm_logp",
        "bucket",
    )
