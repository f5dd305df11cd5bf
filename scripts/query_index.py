#!/usr/bin/env python
"""spark-submit entry point: query a packed index — the CLI analogue
of the reference's /select, /mlt and /uf request handlers
(DiceMoreLikeThisHandler.java:67-271,
DiceUnsupervisedFeedbackHandler + UnsupervisedFeedbackHelper
.java:101-131), served entirely from segment files.

  # BM25 term query (term^boost syntax)
  spark-submit --py-files solrplugins_spark.zip scripts/query_index.py \\
      --index /path/to/index --query "dup^2 batch" --k 10

  # full /select: boolean query + facets + stored page
  ... --mode select --query "dup and not batch" --facet lang --stored

  # /mlt for seed docs
  ... --mode mlt --seeds 0,42 --k 10

  # /uf (unsupervised feedback)
  ... --mode uf --query "dup" --k 10

``--index`` takes ONE packed index directory or a comma-separated
list of generation directories (e.g. streamed generations packed by
process_generation(pack=True) before compaction) — every mode serves
from generation lists with global statistics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="packed index dir, or comma-separated generation dirs")
    ap.add_argument("--mode", choices=["term", "select", "mlt", "uf"],
                    default="term")
    ap.add_argument("--query", default=None,
                    help="term mode: terms (term^boost); select/uf: boolean query")
    ap.add_argument("--seeds", default=None, help="mlt mode: comma-separated doc ids")
    ap.add_argument("--facet", action="append", default=[],
                    help="select mode: facet field (repeatable)")
    ap.add_argument("--facet-query", action="append", default=[],
                    help="select mode: name=subquery facet.query (repeatable)")
    ap.add_argument("--stats-field", action="append", default=[],
                    help="select mode: stats.field numeric docvalues column "
                         "(repeatable)")
    ap.add_argument("--stats-facet", action="append", default=[],
                    help="select mode: stats_col=facet_col per-bucket stats "
                         "(repeatable)")
    ap.add_argument("--percentiles", action="append", default=[],
                    help="select mode: col=p1,p2,... exact stats "
                         "percentiles (repeatable)")
    ap.add_argument("--stored", action="store_true",
                    help="select mode: attach stored fields to the result page")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--max-seed-docs", type=int, default=5)
    args = ap.parse_args()

    def kv_pairs(values: list[str], flag: str) -> dict | None:
        out_kv: dict[str, str] = {}
        for s in values:
            if "=" not in s:
                ap.error(f"{flag} takes name=value, got {s!r}")
            k, v = s.split("=", 1)
            if k in out_kv:
                ap.error(f"{flag}: duplicate name {k!r}")
            out_kv[k] = v
        return out_kv or None

    # arg-shape errors surface BEFORE the session/index spin-up
    fqs = kv_pairs(args.facet_query, "--facet-query")
    sfacet = kv_pairs(args.stats_facet, "--stats-facet")
    pcts = None
    if args.percentiles:
        try:
            pcts = {
                k: [float(x) for x in v.split(",")]
                for k, v in kv_pairs(args.percentiles, "--percentiles").items()
            }
        except ValueError:
            ap.error("--percentiles takes col=p1,p2,... with numeric p")

    from solrplugins_spark.analysis.payloads import parse_payload_tokens
    from solrplugins_spark.index.segments import SegmentIndex, wand_search, wand_search_multi
    from solrplugins_spark.query.handlers import (
        packed_feedback_handler,
        packed_mlt_handler,
        packed_select_handler,
    )
    from solrplugins_spark.query.mlt import MLTParams
    from solrplugins_spark.session import get_spark

    spark = get_spark("query_index")
    paths = [p for p in args.index.split(",") if p]
    gens = [SegmentIndex.load(p) for p in paths]
    seg = gens if len(gens) > 1 else gens[0]

    if args.mode in ("mlt", "uf") and (args.k1 != 1.2 or args.b != 0.75):
        ap.error("--k1/--b apply to term and select modes only "
                 "(mlt/uf score with the reference's default BM25)")
    t0 = time.time()
    out: dict = {"mode": args.mode, "k": args.k, "generations": len(gens)}
    if args.mode == "term":
        if not args.query:
            ap.error("--query required for term mode")
        boosts = parse_payload_tokens(args.query)
        df = (
            wand_search_multi(spark, gens, boosts, k=args.k, k1=args.k1, b=args.b)
            if len(gens) > 1
            else wand_search(spark, seg, boosts, k=args.k, k1=args.k1, b=args.b)
        )
        out["query"] = args.query
        out["hits"] = [
            {"doc_id": r["doc_id"], "score": r["score"]} for r in df.collect()
        ]
    elif args.mode == "select":
        if not args.query:
            ap.error("--query required for select mode")
        resp = packed_select_handler(
            spark, seg, args.query, k=args.k, k1=args.k1, b=args.b,
            facet_fields=args.facet or None, facet_queries=fqs,
            stats_fields=args.stats_field or None, stats_facet=sfacet,
            stats_percentiles=pcts, with_stored=args.stored,
        )
        out["query"] = args.query
        out["docs"] = [r.asDict() for r in resp["docs"].collect()]
        for f in args.facet:
            out[f"facet_{f}"] = [r.asDict() for r in resp[f"facet_{f}"].collect()]
        for key, df in resp.items():
            if key == "facet_queries" or key.startswith(
                ("stats_", "percentiles_")
            ):
                out[key] = [r.asDict() for r in df.collect()]
    elif args.mode == "mlt":
        if not args.seeds:
            ap.error("--seeds required for mlt mode")
        seeds = [int(s) for s in args.seeds.split(",")]
        resp = packed_mlt_handler(spark, seg, seeds, MLTParams(), k=args.k)
        out["seeds"] = seeds
        out["docs"] = [r.asDict() for r in resp["docs"].collect()]
        out["interesting_terms"] = [
            r.asDict() for r in resp["interesting_terms"].collect()
        ]
    else:  # uf
        if not args.query:
            ap.error("--query required for uf mode")
        resp = packed_feedback_handler(
            spark, seg, args.query, MLTParams(), k=args.k,
            max_seed_docs=args.max_seed_docs,
        )
        out["query"] = args.query
        out["docs"] = [r.asDict() for r in resp["docs"].collect()]
        out["interesting_terms"] = [
            r.asDict() for r in resp["interesting_terms"].collect()
        ]
    out["latency_sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
