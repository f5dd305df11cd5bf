#!/usr/bin/env python
"""spark-submit entry point: build the packed inverted index.

Usage (cluster):
  spark-submit --py-files solrplugins_spark.zip scripts/build_index.py \\
      --input my_catalog.db.transcripts --output s3://bucket/index \\
      --seg-size 1048576 --groups 64 [--resume]

Usage (local test):
  python scripts/build_index.py --input /root/testdata/sf0.001/documents.parquet \\
      --output /tmp/idx --doc-col doc_id

The build is resumable: re-running with --resume skips completed
segment groups recorded in the manifest (lineage + throughput per
group, BASELINE.json north rule).
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
    ap.add_argument("--input", required=True, help="iceberg table name or path")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--doc-col", default=None, help="existing dense doc id column; omit to mint from --order-cols")
    ap.add_argument("--order-cols", default="conv_id,turn_idx")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--seg-size", type=int, default=1 << 20)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from solrplugins_spark.session import get_spark
    from solrplugins_spark.sources import read_table
    from solrplugins_spark.index.builder import build_index, mint_doc_ids
    from solrplugins_spark.index.segments import build_segments

    spark = get_spark("build_index")
    t0 = time.time()
    docs = read_table(spark, args.input)
    if args.doc_col:
        docs = docs.withColumnRenamed(args.doc_col, "doc_id")
    else:
        docs = mint_doc_ids(docs, tuple(args.order_cols.split(",")))
    docs = docs.persist()
    n = docs.count()
    idx = build_index(docs, text_col=args.text_col).persist()
    seg = build_segments(
        idx, args.output, seg_size=args.seg_size, groups=args.groups,
        resume=args.resume,
    )
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "docs": n,
                "n_segments": seg.n_segments,
                "avgdl": round(seg.avgdl, 3),
                "seconds": round(elapsed, 2),
                "docs_per_sec": round(n / elapsed, 1),
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
