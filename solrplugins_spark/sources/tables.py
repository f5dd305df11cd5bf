"""Table IO: Iceberg-first with parquet fallback.

The north rule's input is an Iceberg table of transcripts. This
container has no Iceberg runtime jars, so reads resolve in order:
  1. a catalog table name (``catalog.db.table``) via spark.table —
     works when the session is configured with an Iceberg catalog
     (spark.sql.catalog.* settings on a real cluster)
  2. ``format("iceberg")`` on a path, when the runtime is present
  3. plain parquet on a path (the test/bench fallback)

All downstream code touches only DataFrames, so the engine is
indifferent to which branch fed it. On a real deployment, partition
pruning + hidden-partitioning come from the Iceberg scan; locally the
parquet reader provides the same pushdown surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, source: str) -> DataFrame:
    if "/" not in source:
        # catalog table name
        return spark.table(source)
    try:
        return spark.read.format("iceberg").load(source)
    except Exception:
        return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    if "/" not in target:
        df.writeTo(target).createOrReplace()
        return
    try:
        df.write.format("iceberg").mode(mode).save(target)
    except Exception:
        df.write.mode(mode).parquet(target)
