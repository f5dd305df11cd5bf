"""Spellcheck: edit-distance suggestions + typo-override dictionary.

Reference: DiceDirectSolrSpellChecker.java —
- Lucene DirectSpellChecker config: maxEdits=2, accuracy=.5,
  minPrefix=1, maxQueryFrequency=.01 (:80-98)
- typos file `lhs1,lhs2=>rhs`, lhs normalized trim+lower (:118-148)
- override rule: suggest the mapped correction only when it exists in
  the index AND is more frequent than the original token
  (matchFreq > 0 && matchFreq > freq, :265-276)

The candidate generator is a declarative EQUI-join against the
``terms`` dictionary on the minPrefix key (hash join, prunable), with
length-window + levenshtein filters evaluated only inside the matching
prefix bucket — all JVM-side. At 10^12-doc scale each query token
reads one prefix bucket of the dictionary, never the full vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import InvertedIndex


def load_typos(lines: list[str]) -> dict[str, str]:
    """Parse `lhs1,lhs2=>rhs` lines; lhs keys normalized trim+lower."""
    out: dict[str, str] = {}
    for line in lines:
        if "=>" not in line:
            continue
        lhs, rhs = line.split("=>", 1)
        rhs = rhs.strip()
        for key in lhs.split(","):
            out[key.strip().lower()] = rhs
    return out


def _grams_col(col: str, n: int):
    """array of DISTINCT char n-grams of ``col`` (empty when shorter
    than n — sequence(1, len-n+1) would otherwise run DESCENDING and
    emit junk grams)."""
    seq = F.sequence(F.lit(1), F.length(col) - n + 1)
    grams = F.array_distinct(
        F.transform(seq, lambda i: F.col(col).substr(i, F.lit(n)))
    )
    return F.when(F.length(col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


from dataclasses import dataclass


@dataclass(frozen=True)
class SpellNgramIndex:
    """A char-n-gram candidate index plus the parameters it was built
    with — spellcheck_suggest validates them against its own
    min_prefix/ngram_n, because a mismatch (e.g. a 2-char query prefix
    joined against 1-char index prefixes) matches NO keys and would
    silently return zero suggestions for every long token."""

    frame: DataFrame
    n: int
    min_prefix: int

    def persist(self) -> "SpellNgramIndex":
        self.frame.persist()
        return self


def build_spell_ngram_index(
    index: InvertedIndex, n: int = 2, min_prefix: int = 1
) -> SpellNgramIndex:
    """Char-n-gram candidate index over the term dictionary — the
    Spark-native analogue of DirectSpellChecker's FST Levenshtein
    automaton (DiceDirectSolrSpellChecker.java:80-98 builds against
    Lucene's term FST): one build-time explosion of the dictionary
    into (term, df, _pfx, _ng) rows, ~(len-1) rows per term. Candidate
    generation then equi-joins on (_pfx, _ng) — buckets are finer than
    the 1-char prefix's |vocab|/|alphabet| by the n-gram's selectivity
    — and is COMPLETE for tokens of length >= n*(max_edits+1): by the
    q-gram lemma one edit destroys at most n char n-grams, so any term
    within max_edits shares >= max(len)-n+1-max_edits*n >= 1 n-gram
    (shorter tokens fall back to the prefix bucket). Persist the
    result next to the index and reuse it across queries."""
    frame = index.terms.select(
        "term", "df", F.substring("term", 1, min_prefix).alias("_pfx"),
        F.explode(_grams_col("term", n)).alias("_ng"),
    )
    return SpellNgramIndex(frame=frame, n=n, min_prefix=min_prefix)


def spellcheck_suggest(
    index: InvertedIndex,
    tokens: list[str],
    typos: dict[str, str] | None = None,
    max_edits: int = 2,
    min_prefix: int = 1,
    accuracy: float = 0.5,
    max_query_frequency: float = 0.01,
    count: int = 5,
    ngram_index: "SpellNgramIndex | DataFrame | None" = None,
    ngram_n: int = 2,
) -> DataFrame:
    """(token, suggestion, freq, distance) ranked per token.

    Suggestions come from the term dictionary: same ``min_prefix``
    prefix, levenshtein <= max_edits, string similarity >= accuracy
    (1 - dist/max(len)), more frequent than the token. Tokens whose own
    df exceeds maxQueryFrequency*N are considered correctly spelled and
    get no edit-distance suggestions (DirectSpellChecker semantics).
    Typo overrides bypass the edit-distance limit but obey the
    matchFreq>freq rule.

    ``ngram_index``: a build_spell_ngram_index frame (built with the
    same ``ngram_n``/``min_prefix``). When given, tokens long enough
    for the q-gram completeness bound generate candidates via the
    finer (_pfx, _ng) equi-key — a fraction of the prefix bucket pays
    the levenshtein — and only short tokens use the prefix bucket.
    Output is identical either way (the candidate set is a superset of
    the filtered result in both paths).
    """
    spark = index.terms.sparkSession
    tok_df = spark.createDataFrame([(t,) for t in tokens], "token string")
    tok_freq = (
        tok_df.join(
            index.terms.select(F.col("term").alias("token"), F.col("df").alias("token_df")),
            "token",
            "left",
        ).fillna({"token_df": 0})
    )
    freq_cap = max_query_frequency * index.n_docs

    # Candidate generation is an EQUI-join on the minPrefix key (the
    # DirectSpellChecker minPrefix=1 contract,
    # DiceDirectSolrSpellChecker.java:80-98): both sides expose
    # substring(.,1,min_prefix) and hash-join on it, so each query
    # token touches only its prefix bucket of the dictionary — a
    # prunable hash join, never a full-vocab nested-loop scan
    # (at 10^8+ terms a per-token dictionary scan is the difference
    # between a lookup and a table pass). Remaining conditions
    # (length window, levenshtein) filter the bucket. With an
    # ``ngram_index`` the join key refines to (prefix, char-n-gram).
    if min_prefix >= 1:
        pfx_terms = index.terms.select(
            "term", "df", F.substring("term", 1, min_prefix).alias("_pfx")
        )
        tok_keyed = tok_freq.withColumn(
            "_pfx", F.substring("token", 1, min_prefix)
        )
        if isinstance(ngram_index, SpellNgramIndex):
            if ngram_index.n != ngram_n or ngram_index.min_prefix != min_prefix:
                raise ValueError(
                    f"ngram_index built with (n={ngram_index.n}, "
                    f"min_prefix={ngram_index.min_prefix}) but the query "
                    f"uses (n={ngram_n}, min_prefix={min_prefix}) — a "
                    "mismatched join key silently matches nothing; "
                    "rebuild the index with matching parameters"
                )
            ngram_index = ngram_index.frame
        if ngram_index is not None:
            thr = ngram_n * (max_edits + 1)  # q-gram completeness bound
            long_toks = (
                tok_keyed.filter(F.length("token") >= thr)
                .withColumn(
                    "_ng",
                    F.explode(
                        _grams_col("token", ngram_n)
                    ),
                )
            )
            cand_long = (
                F.broadcast(long_toks)
                .join(ngram_index, ["_pfx", "_ng"])
                .dropDuplicates(["token", "term"])
                .select("token", "token_df", "term", "df")
            )
            cand_short = (
                F.broadcast(tok_keyed.filter(F.length("token") < thr))
                .join(pfx_terms, "_pfx")
                .select("token", "token_df", "term", "df")
            )
            cand = cand_long.unionByName(cand_short)
        else:
            cand = F.broadcast(tok_keyed).join(pfx_terms, "_pfx")
    else:  # degenerate config: no prefix key to join on
        cand = F.broadcast(tok_freq).crossJoin(index.terms.select("term", "df"))
    cand = cand.filter(
        (F.col("token_df") <= freq_cap)
        & (F.col("term") != F.col("token"))
        & (F.abs(F.length("term") - F.length("token")) <= max_edits)
    )
    dist = F.levenshtein("term", "token")
    sim = 1.0 - dist / F.greatest(F.length("term"), F.length("token"))
    edits = (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") <= max_edits)
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= accuracy)
        .filter(F.col("df") > F.col("token_df"))
        .select("token", F.col("term").alias("suggestion"), F.col("df").alias("freq"), "distance")
    )

    if typos:
        typo_df = spark.createDataFrame(
            [(k, v) for k, v in typos.items()], "norm_token string, correction string"
        )
        overrides = (
            tok_freq.withColumn("norm_token", F.lower(F.trim("token")))
            .join(F.broadcast(typo_df), "norm_token")
            .join(
                index.terms.select(
                    F.col("term").alias("correction"), F.col("df").alias("freq")
                ),
                "correction",
            )
            # matchFreq > 0 && matchFreq > freq (:265-276)
            .filter((F.col("freq") > 0) & (F.col("freq") > F.col("token_df")))
            .select(
                "token",
                F.col("correction").alias("suggestion"),
                "freq",
                F.lit(-1).cast("int").alias("distance"),  # override marker
            )
        )
        edits = edits.unionByName(overrides)

    from pyspark.sql import Window as W

    # a correction can surface via both the typo override and the
    # edit-distance path — keep one row (the override marker wins)
    edits = (
        edits.groupBy("token", "suggestion")
        .agg(F.max("freq").alias("freq"), F.min("distance").alias("distance"))
    )
    w = W.partitionBy("token").orderBy(
        F.asc(F.when(F.col("distance") < 0, -1).otherwise(F.col("distance"))),
        F.desc("freq"),
        F.asc("suggestion"),
    )
    return (
        edits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= count)
        .select("token", "suggestion", "freq", "distance", "rank")
    )


def spellcheck_collations(
    index: InvertedIndex,
    tokens: list[str],
    typos: dict[str, str] | None = None,
    suggestions_per_token: int = 3,
    max_collations: int = 5,
    **spell_kwargs,
) -> DataFrame:
    """(collation, score) whole-query rewrites — the user-facing
    "did you mean" strings.

    Reference: DiceSpellCheckComponent composes collated query rewrites
    from per-token suggestions (the collate behavior the per-token
    suggest path stops short of). Per position, candidates are the
    token itself when it exists in the dictionary (freq = its df) plus
    its top ``suggestions_per_token`` spellcheck suggestions; a
    collation is one candidate per position, scored by the product of
    candidate frequencies (reported as round(sum ln freq, 5) to stay
    in double range). Deterministic order: score desc, collation asc.

    The cross-product is over per-token candidate frames (bounded by
    suggestions_per_token^len(tokens), a driver-side-small number) —
    the corpus-scale work is the dictionary joins inside
    spellcheck_suggest, which stay distributed.
    """
    spark = index.terms.sparkSession
    sugg = spellcheck_suggest(
        index, tokens, typos=typos, count=suggestions_per_token, **spell_kwargs
    )
    tok_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "pos int, token string"
    )
    self_cand = tok_df.join(
        index.terms.select(F.col("term").alias("token"), F.col("df").alias("freq")),
        "token",
    ).select("pos", F.col("token").alias("suggestion"), "freq")
    sugg_cand = tok_df.join(sugg, "token").select("pos", "suggestion", "freq")
    cand = (
        self_cand.unionByName(sugg_cand)
        .groupBy("pos", "suggestion")
        .agg(F.max("freq").alias("freq"))
    )

    coll = None
    for i in range(len(tokens)):
        ci = F.broadcast(
            cand.filter(F.col("pos") == i).select(
                F.col("suggestion").alias(f"_t{i}"), F.col("freq").alias(f"_f{i}")
            )
        )
        coll = ci if coll is None else coll.crossJoin(ci)
    collation = F.concat_ws(" ", *[F.col(f"_t{i}") for i in range(len(tokens))])
    score = None
    for i in range(len(tokens)):
        term = F.log(F.col(f"_f{i}").cast("double"))
        score = term if score is None else score + term
    return (
        coll.select(
            collation.alias("collation"), F.round(score, 5).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("collation"))
        .limit(max_collations)
    )
