#!/usr/bin/env python
"""spark-submit entry: the scaling-contract job under REAL executor
processes (local-cluster / standalone / YARN), packaged via --py-files.

The north rule's two-cluster-size criterion is evidenced in-sandbox by
running this SAME script at two executor counts and comparing
throughput; on a real cluster the identical command line (different
--master) is the validation run. This script deliberately does NOT
sys.path the repo — ``import solrplugins_spark`` must resolve from the
--py-files zip, so every run also exercises the deployment packaging.

Usage:
  spark-submit --master 'local-cluster[4,1,2304]' \\
      --py-files solrplugins_spark.zip scripts/scaling_cluster.py \\
      --turns 400000 --partitions 32 --trials 2

Prints ONE JSON line:
  {"master": ..., "turns": N, "times": [...s per trial],
   "executor_pids": [...], "driver_pid": ...}
executor_pids are the DISTINCT python-worker parent pids — one per
executor JVM, all different from driver_pid, proving the work ran in
separate executor processes (not driver threads).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=400_000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from solrplugins_spark.corpus import transcripts
    from solrplugins_spark.index.builder import corpus_term_stats
    from solrplugins_spark.session import get_spark

    spark = get_spark("scaling_cluster", shuffle_partitions=8)
    sc = spark.sparkContext
    docs = (
        transcripts(spark, args.turns, 20, partitions=args.partitions)
        .withColumn("doc_id", F.monotonically_increasing_id())
        .persist()
    )
    docs.count()

    def pipeline() -> None:
        corpus_term_stats(docs).count()

    pipeline()  # warmup: executor registration + JIT + python workers
    times = []
    for _ in range(args.trials):
        t0 = time.time()
        pipeline()
        times.append(round(time.time() - t0, 3))

    def _ppid(_):
        import os as _os

        return _os.getppid()

    pids = sorted(set(sc.parallelize(range(64), 64).map(_ppid).collect()))
    print(
        json.dumps(
            {
                "master": sc.master,
                "turns": args.turns,
                "partitions": args.partitions,
                "times": times,
                "executor_pids": pids,
                "driver_pid": os.getpid(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
