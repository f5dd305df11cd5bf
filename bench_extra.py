#!/usr/bin/env python
"""Query-section-only benchmark (guide §1.4 isolation harness).

bench.py is FROZEN for driver measurement; this file exists so the
optimization loop can re-measure the query/serving section in ~2 min
instead of the full ~25 min record (which is dominated by the scaling
contract). Same fixtures, same queries, same best-of-3 methodology as
bench.py's query section; scale is parameterized so the packed path
can be measured at the driver's escalated sf (sf1.0 == 2M turns) as
well as the local default (sf0.1 == 200k).

Usage: python bench_extra.py [--turns 200000] [--skip-flat] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TURNS_PER_CONV = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--skip-flat", action="store_true")
    ap.add_argument("--skip-components", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from solrplugins_spark.corpus import transcripts
    from solrplugins_spark.index.builder import build_index, mint_doc_ids
    from solrplugins_spark.index.segments import (
        build_segments,
        wand_facet_search,
        wand_phrase_search,
        wand_search,
    )
    from solrplugins_spark.query.compiler import execute_query
    from solrplugins_spark.query.feedback import unsupervised_feedback
    from solrplugins_spark.query.mlt import MLTParams, more_like_this
    from solrplugins_spark.query.scorer import search_terms
    from solrplugins_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    sc = spark.sparkContext
    t_all = time.time()
    docs = mint_doc_ids(
        transcripts(spark, args.turns, TURNS_PER_CONV, partitions=CPUS * 2)
    ).persist()
    docs.count()
    idx = build_index(docs, positions=True).persist()
    idx.postings.count()
    idx.terms.count()
    idx.doclen.count()

    seg_dir = tempfile.mkdtemp(prefix="bx_segs_")
    t0 = time.time()
    seg = build_segments(
        idx, os.path.join(seg_dir, "idx"), seg_size=65536, groups=4,
        string_cols=["role"], store_cols=["text"], value_cols=["turn_idx"],
    )
    seg_build_secs = time.time() - t0

    phrase = docs.select("text").first()["text"].lower().split()[:2]
    mlt_params = MLTParams(min_doc_freq=2, max_query_terms=20)

    queries = {}
    if not args.skip_flat:
        queries.update({
            "q_rare_term": lambda: search_terms(idx, [("zephyrblade", 1.0)], k=10),
            "q_head_term": lambda: search_terms(idx, [("w0000", 1.0)], k=10),
            "q_boosted_or": lambda: search_terms(
                idx, [("zephyrblade", 2.0), ("w0003", 1.0), ("w0100", 0.5)], k=10
            ),
            "q_boolean": lambda: execute_query(idx, "w0003 and w0007 or quartzowl", k=10),
            "q_not": lambda: execute_query(idx, "quartzowl and not w0000", k=10),
            "q_mlt": lambda: more_like_this(idx, [7], mlt_params, k=10),
            "q_feedback": lambda: unsupervised_feedback(
                idx, "embermoth", k=10, params=mlt_params
            ),
        })
    queries.update({
        "q_wand_rare": lambda: wand_search(spark, seg, [("zephyrblade", 1.0)], k=10),
        "q_wand_or": lambda: wand_search(
            spark, seg, [("zephyrblade", 2.0), ("w0003", 1.0), ("w0100", 0.5)], k=10
        ),
        "q_wand_head_or": lambda: wand_search(
            spark, seg, [("w0000", 1.0), ("w0001", 1.0), ("zephyrblade", 2.0)], k=10
        ),
        "q_wand_phrase": lambda: wand_phrase_search(spark, seg, phrase, k=10),
    })

    def time_query(name, fn) -> float:
        sc.setJobDescription(f"bx:{name}")
        fn().collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn().collect()
            best = min(best, time.time() - t0)
        sc.setJobDescription(None)
        return round(best, 4)

    def count_jobs(name: str, fn) -> int:
        sc.setJobGroup(name, name)
        try:
            fn().collect()
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(name))

    timings = {name: time_query(name, fn) for name, fn in queries.items()}
    jobs = {name: count_jobs(f"bxj_{name}", fn) for name, fn in queries.items()}

    components = {}
    serving = {}
    if not args.skip_components:
        from solrplugins_spark.index.segments import (
            wand_collapse_search,
            wand_facet_query_search,
            wand_facet_range_search,
            wand_rerank_search,
            wand_stats_facet_search,
            wand_stats_search,
        )
        from solrplugins_spark.query.handlers import (
            packed_feedback_handler,
            packed_mlt_handler,
        )

        p1 = wand_search(
            spark, seg, [("w0000", 1.0), ("zephyrblade", 2.0)], k=10
        ).collect()
        cursor = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
        comp_fns = {
            "wand_facet_secs": lambda: wand_facet_search(
                spark, seg, "zephyrblade or w0003", "role"),
            "wand_collapse_secs": lambda: wand_collapse_search(
                spark, seg, "zephyrblade or w0003", "role", k=10),
            "wand_rerank_secs": lambda: wand_rerank_search(
                spark, seg, "zephyrblade or w0003", "w0100",
                k=10, rerank_docs=30, weight=2.0),
            "wand_facet_range_secs": lambda: wand_facet_range_search(
                spark, seg, "zephyrblade", "turn_idx", 0, 24, 4),
            "wand_stats_secs": lambda: wand_stats_search(
                spark, seg, "zephyrblade or w0003", "turn_idx"),
            "cursor_page2_secs": lambda: wand_search(
                spark, seg, [("w0000", 1.0), ("zephyrblade", 2.0)],
                k=10, after=cursor),
            "wand_facet_query_secs": lambda: wand_facet_query_search(
                spark, seg, "zephyrblade or w0003",
                {"w3": "w0003", "early": "turn_idx:[0 TO 5]",
                 "nz": "not zephyrblade"}),
            "wand_stats_facet_secs": lambda: wand_stats_facet_search(
                spark, seg, "zephyrblade or w0003", "turn_idx", "role"),
            "wand_phrase_slop_secs": lambda: wand_phrase_search(
                spark, seg, phrase, k=10, slop=2),
        }
        components = {n: time_query(n, fn) for n, fn in comp_fns.items()}
        components_jobs = {
            n: count_jobs(f"bxj_{n}", fn) for n, fn in comp_fns.items()
        }
        components["jobs"] = components_jobs

        serv_fns = {
            "wand_mlt": lambda: packed_mlt_handler(
                spark, seg, [7], mlt_params, k=10)["docs"],
            "wand_feedback": lambda: packed_feedback_handler(
                spark, seg, "embermoth", mlt_params, k=10)["docs"],
        }
        if not args.skip_flat:
            serv_fns.update({
                "flat_mlt": lambda: more_like_this(idx, [7], mlt_params, k=10),
                "flat_feedback": lambda: unsupervised_feedback(
                    idx, "embermoth", k=10, params=mlt_params),
            })
        for name, fn in serv_fns.items():
            serving[f"{name}_secs"] = time_query(name, fn)
            serving[f"{name}_spark_jobs"] = count_jobs(f"bxj_{name}", fn)

    lat = sorted(timings.values())
    p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))]
    out = {
        "turns": args.turns,
        "p95": p95,
        "queries": timings,
        "query_jobs": jobs,
        "components": components,
        **serving,
        "segment_build_secs": round(seg_build_secs, 2),
        "total_secs": round(time.time() - t_all, 1),
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
