#!/usr/bin/env python
"""Capture .explain('formatted') for every bench query + serving
component into plans/r07/<name>_<tag>.txt (tag = before/after).

Usage: python scripts/capture_plans_r07.py before [--turns 200000]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--turns", type=int, default=200_000)
    args = ap.parse_args()
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from solrplugins_spark.corpus import transcripts
    from solrplugins_spark.index.builder import build_index, mint_doc_ids
    from solrplugins_spark.index.segments import (
        build_segments,
        wand_collapse_search,
        wand_facet_query_search,
        wand_facet_range_search,
        wand_facet_search,
        wand_phrase_search,
        wand_rerank_search,
        wand_search,
        wand_stats_facet_search,
        wand_stats_search,
    )
    from solrplugins_spark.query.compiler import execute_query
    from solrplugins_spark.query.feedback import unsupervised_feedback
    from solrplugins_spark.query.mlt import MLTParams, more_like_this
    from solrplugins_spark.query.scorer import search_terms
    from solrplugins_spark.session import get_spark

    spark = get_spark("plans_r07", cores=CPUS, shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    docs = mint_doc_ids(
        transcripts(spark, args.turns, 20, partitions=CPUS * 2)
    ).persist()
    docs.count()
    idx = build_index(docs, positions=True).persist()
    idx.postings.count()
    idx.terms.count()
    idx.doclen.count()
    seg_dir = tempfile.mkdtemp(prefix="plans_segs_")
    seg = build_segments(
        idx, os.path.join(seg_dir, "idx"), seg_size=65536, groups=4,
        string_cols=["role"], store_cols=["text"], value_cols=["turn_idx"],
    )
    phrase = docs.select("text").first()["text"].lower().split()[:2]
    mlt_params = MLTParams(min_doc_freq=2, max_query_terms=20)
    p1 = wand_search(spark, seg, [("w0000", 1.0), ("zephyrblade", 2.0)], k=10).collect()
    cursor = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))

    fns = {
        "q_rare_term": lambda: search_terms(idx, [("zephyrblade", 1.0)], k=10),
        "q_head_term": lambda: search_terms(idx, [("w0000", 1.0)], k=10),
        "q_boosted_or": lambda: search_terms(
            idx, [("zephyrblade", 2.0), ("w0003", 1.0), ("w0100", 0.5)], k=10),
        "q_boolean": lambda: execute_query(idx, "w0003 and w0007 or quartzowl", k=10),
        "q_not": lambda: execute_query(idx, "quartzowl and not w0000", k=10),
        "q_mlt": lambda: more_like_this(idx, [7], mlt_params, k=10),
        "q_feedback": lambda: unsupervised_feedback(
            idx, "embermoth", k=10, params=mlt_params),
        "q_wand_rare": lambda: wand_search(spark, seg, [("zephyrblade", 1.0)], k=10),
        "q_wand_or": lambda: wand_search(
            spark, seg, [("zephyrblade", 2.0), ("w0003", 1.0), ("w0100", 0.5)], k=10),
        "q_wand_head_or": lambda: wand_search(
            spark, seg, [("w0000", 1.0), ("w0001", 1.0), ("zephyrblade", 2.0)], k=10),
        "q_wand_phrase": lambda: wand_phrase_search(spark, seg, phrase, k=10),
        "wand_facet": lambda: wand_facet_search(
            spark, seg, "zephyrblade or w0003", "role"),
        "wand_collapse": lambda: wand_collapse_search(
            spark, seg, "zephyrblade or w0003", "role", k=10),
        "wand_rerank": lambda: wand_rerank_search(
            spark, seg, "zephyrblade or w0003", "w0100",
            k=10, rerank_docs=30, weight=2.0),
        "wand_facet_range": lambda: wand_facet_range_search(
            spark, seg, "zephyrblade", "turn_idx", 0, 24, 4),
        "wand_stats": lambda: wand_stats_search(
            spark, seg, "zephyrblade or w0003", "turn_idx"),
        "cursor_page2": lambda: wand_search(
            spark, seg, [("w0000", 1.0), ("zephyrblade", 2.0)], k=10, after=cursor),
        "wand_facet_query": lambda: wand_facet_query_search(
            spark, seg, "zephyrblade or w0003",
            {"w3": "w0003", "early": "turn_idx:[0 TO 5]", "nz": "not zephyrblade"}),
        "wand_stats_facet": lambda: wand_stats_facet_search(
            spark, seg, "zephyrblade or w0003", "turn_idx", "role"),
        "wand_phrase_slop": lambda: wand_phrase_search(
            spark, seg, phrase, k=10, slop=2),
    }
    for name, fn in fns.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn().explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{args.tag}")
    spark.stop()


if __name__ == "__main__":
    main()
