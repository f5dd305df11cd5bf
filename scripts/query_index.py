#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k query over a packed index.

  spark-submit --py-files solrplugins_spark.zip scripts/query_index.py \\
      --index s3://bucket/index --query "dup^2 batch" --k 10
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, help="terms, optionally term^boost")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    args = ap.parse_args()

    from solrplugins_spark.session import get_spark
    from solrplugins_spark.analysis.payloads import parse_payload_tokens
    from solrplugins_spark.index.segments import SegmentIndex, wand_search

    spark = get_spark("query_index")
    seg = SegmentIndex.load(args.index)
    boosts = parse_payload_tokens(args.query)
    t0 = time.time()
    rows = wand_search(
        spark, seg, boosts, k=args.k, k1=args.k1, b=args.b
    ).collect()
    print(
        json.dumps(
            {
                "query": args.query,
                "k": args.k,
                "latency_sec": round(time.time() - t0, 3),
                "hits": [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows],
            }
        )
    )


if __name__ == "__main__":
    main()
