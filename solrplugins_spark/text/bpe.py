"""Distributed BPE tokenizer-training statistics (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

A training-data pipeline that ships transcripts into an LLM needs the
tokenizer-training side too: count adjacent symbol pairs over the
corpus, repeatedly merge the most frequent pair, emit the merge table.
The reference engine has no tokenizer training — this extends the
text/ pipeline family (lm.py, analysis.py) with the canonical
subword-vocabulary construction.

Scale shape (the part that matters at 100 TB): the corpus collapses to
the DISTINCT-WORD frame first — one `explode(tokens) -> groupBy(word)
.count()` shuffle with map-side combine, after which every BPE
statistic is weighted by word frequency over a vocabulary-bounded
frame (natural-language word vocabularies are millions of rows, not
corpus-sized; the corpus itself is read exactly once). Pair counting
is a JVM higher-order projection + one hash agg; the iterative trainer
re-uses the persisted word frame every round, so `n_merges` rounds
cost n vocabulary-bounded jobs, never another corpus scan. The argmax
pair broadcasts implicitly as a plan literal (two strings), and the
merge application is a vectorized Arrow pass over the symbol arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.tokenizer import tokens_col


def word_counts(docs: DataFrame, text_col: str = "text", **tok_kwargs) -> DataFrame:
    """(word, cnt) distinct-word frame — the corpus-collapsing first
    shuffle every BPE statistic runs on. Engine tokenizer grammar."""
    return (
        docs.select(F.explode(tokens_col(text_col, **tok_kwargs)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_pair(s: list[str], l: str, r: str) -> list[str]:
    """One left-to-right non-overlapping merge pass — shared by the
    trainer and the encoder so the statistics a table was trained on
    and the segmentation it produces can never drift apart."""
    m = l + r
    res: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
            res.append(m)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def _char_pairs(col: str = "word"):
    """array<struct<l,r>> of adjacent character pairs — JVM-side."""
    return F.expr(
        f"transform(sequence(1, length({col}) - 1), "
        f"i -> struct(substring({col}, i, 1) as l, "
        f"substring({col}, i + 1, 1) as r))"
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", limit: int = 20, **tok_kwargs
) -> DataFrame:
    """Round-0 BPE pair statistics: occurrence-weighted counts of
    adjacent CHARACTER pairs over the corpus, deterministic order
    (cnt desc, l asc, r asc), top ``limit``.

    Single-character words contribute nothing (no pairs); every pair
    occurrence inside a word counts once per corpus occurrence of the
    word (`sum(word_cnt)` over the word's pair multiset — exactly the
    statistics the first BPE merge maximizes)."""
    wc = word_counts(docs, text_col=text_col, **tok_kwargs)
    return (
        wc.filter(F.length("word") >= 2)
        .select("cnt", F.explode(_char_pairs()).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(limit)
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    batch_max: int = 64,
    stats: dict | None = None,
    **tok_kwargs,
) -> list[tuple[str, str]]:
    """The merge table: ``n_merges`` (left, right) pairs in merge
    order — argmax pair count, ties broken (l asc, r asc) for
    run-to-run determinism (reference BPE breaks ties by dict order
    too).

    BATCHED rounds (r07): the one-merge-per-round loop cost one
    driver round-trip job PER MERGE — a production 32k-merge
    vocabulary is tens of thousands of sequential jobs. Each round now
    applies the longest PREFIX of the (count desc, l, r)-sorted pair
    list that is provably sequential-identical, so the merge table is
    bit-identical to the one-at-a-time trainer (pinned in
    tests/test_bpe.py) while the round count drops by the average
    prefix length. A sorted prefix p_1..p_m is safe when, for every
    accepted i > 1:

    * p_i shares no symbol with an earlier accepted pair — the merges
      then commute, no accepted pair's occurrences are created or
      destroyed by the others, and old-pair counts never increase
      (merging only removes adjacencies between old symbols);
    * no earlier product string x_j = l_j + r_j already exists as a
      symbol (single chars are length-1 and every multi-char symbol is
      a previous product, so a driver-side set test suffices) — else
      merge j would ADD occurrences to existing pairs;
    * c_i strictly exceeds every earlier merge's possible new-pair
      mass: a new pair bred by merge j is (a, x_j) or (x_j, b), and
      each of its occurrences consumed one pre-batch (a, l_j) /
      (r_j, b) occurrence AND one (l_j, r_j) occurrence, so its count
      is <= min(c_j, U_j) with U_j = max count over pairs whose right
      element is l_j or whose left element is r_j — both read from
      the SAME round's pair table.

    The prefix stops at the first violation (skipping a conflicting
    pair would change what the sequential argmax sees). Each round is
    a bounded set of vocabulary-bounded jobs: one pair count + top-K
    collect, two candidate-symbol max lookups, one Arrow merge pass.
    """
    spark = docs.sparkSession
    wc = word_counts(docs, text_col=text_col, **tok_kwargs)
    words = (
        wc.filter(F.length("word") >= 2)
        .select(
            # explicit per-position substring: split(word, '') emits a
            # trailing empty element on some Spark versions
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            ).alias("syms"),
            "cnt",
        )
        .persist()
    )
    words.count()
    merges: list[tuple[str, str]] = []
    products: set[str] = set()
    prev = words
    round_no = 0
    while len(merges) < n_merges:
        # guard size>=2: Spark's sequence(1, 0) DESCENDS ([1, 0]), so
        # an unguarded fully-merged single-symbol word would fabricate
        # a (sym, null) pair instead of contributing none
        pairs = (
            prev.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] as l, syms[i] as r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
        ).persist()
        cap = min(int(batch_max), n_merges - len(merges))
        top = (
            pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(max(cap, 2))
            .collect()
        )
        if not top:
            pairs.unpersist()
            break
        if len(top) > 1 and cap > 1:
            cand_ls = sorted({row["l"] for row in top})
            cand_rs = sorted({row["r"] for row in top})
            lmax = {
                row["r"]: int(row["m"])
                for row in pairs.filter(F.col("r").isin(cand_ls))
                .groupBy("r").agg(F.max("c").alias("m")).collect()
            }
            rmax = {
                row["l"]: int(row["m"])
                for row in pairs.filter(F.col("l").isin(cand_rs))
                .groupBy("l").agg(F.max("c").alias("m")).collect()
            }
        else:
            lmax = rmax = {}
        pairs.unpersist()

        used: set[str] = set()
        accepted: list[tuple[str, str]] = []
        new_pair_bound = 0
        for row in top:
            if len(accepted) >= cap:
                break
            l, r, c = row["l"], row["r"], int(row["c"])
            if accepted:
                if l in used or r in used or c <= new_pair_bound:
                    break
            if l + r in products or any(
                l + r == al + ar for al, ar in accepted
            ):
                if accepted:
                    break
                # degenerate: re-merging an existing product string as
                # the TOP pair is still a plain sequential step
            accepted.append((l, r))
            used.update((l, r))
            u = max(lmax.get(l, 0), rmax.get(r, 0))
            new_pair_bound = max(new_pair_bound, min(c, u))
            if l + r in products:
                break  # product collision: nothing may batch after it
        merges.extend(accepted)
        products.update(al + ar for al, ar in accepted)
        batch = list(accepted)

        def apply_merges(pdf_iter, _batch=batch):
            for pdf in pdf_iter:
                out = []
                for s in pdf["syms"]:
                    cur = list(s)
                    for _l, _r in _batch:
                        cur = _merge_pair(cur, _l, _r)
                    out.append(cur)
                yield pd.DataFrame(
                    {"syms": out, "cnt": pdf["cnt"].to_numpy()}
                )

        nxt = prev.mapInPandas(
            apply_merges, schema="syms array<string>, cnt long"
        )
        # materialize BEFORE unpersisting the parent: truncates the
        # per-round lineage chain (same spot-node-safe pattern as
        # dedup clustering). Checkpoint rounds materialize through
        # localCheckpoint ALONE — persisting first would pin a second
        # copy of the pre-checkpoint frame that nothing ever releases
        round_no += 1
        if round_no % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        if prev is not words:
            prev.unpersist()
        else:
            # ADVICE r06: only round 0 reads the raw word frame — drop
            # its cache as soon as the first merged frame materializes
            words.unpersist()
        prev = nxt
    if prev is not words:
        prev.unpersist()
    else:
        words.unpersist()
    if stats is not None:
        stats["rounds"] = round_no
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    **tok_kwargs,
) -> DataFrame:
    """Segment every doc's words with a trained merge table — the
    deterministic greedy-by-merge-rank encoder (each merge applied in
    table order, the standard BPE encode). One Arrow pass over the
    corpus; the merge table broadcasts inside the closure."""
    table = list(merges)

    def encode(pdf_iter):
        for pdf in pdf_iter:
            toks_out = []
            word_cache: dict[str, list[str]] = {}
            for toks in pdf["_toks"]:
                enc: list[str] = []
                for w in toks:
                    if w not in word_cache:
                        s = list(w)
                        for l, r in table:
                            s = _merge_pair(s, l, r)
                        word_cache[w] = s
                    enc.extend(word_cache[w])
                toks_out.append(enc)
            out = pdf.drop(columns=["_toks"])
            out[out_col] = toks_out
            yield out

    with_toks = docs.withColumn(
        "_toks", tokens_col(text_col, **tok_kwargs)
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return with_toks.mapInPandas(
        encode, schema=f"{fields}, {out_col} array<string>"
    )
