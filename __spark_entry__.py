"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001
queries()      — one callable per implemented operator (SURVEY.md §2)
oracle_sql()   — matching DuckDB ANSI-SQL oracles (same column names,
                 same round(x,5) on float scores)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solrplugins_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-phase unsupervised feedback (seed -> MLT term
    expansion -> boosted re-execution) over sf0.001 documents."""
    return registry.q_feedback(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
