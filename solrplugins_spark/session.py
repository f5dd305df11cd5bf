"""SparkSession factory tuned for the engine.

Local mode is a correctness harness; the configs below are the ones
that matter at cluster scale too (AQE, Arrow, shuffle partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "solrplugins_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or all cores. ``shuffle_partitions`` defaults
    to the core count — at cluster scale you'd size this to
    ~2-3x total executor cores and let AQE coalesce.
    """
    explicit_cores = cores is not None
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # Master precedence:
    #   1. $SPARK_GRAFT_MASTER — explicit user override, beats all;
    #   2. an EXPLICIT cores=N argument — the caller asked for exactly
    #      local[N] (benchmarks measuring a core count must not be
    #      silently retargeted by ambient env);
    #   3. $MASTER — what spark-submit exports for python apps
    #      (local-cluster / standalone / YARN), so no-cores entry
    #      points (scripts/, scaling_cluster) run unchanged on a real
    #      cluster;
    #   4. local[cores] default.
    # Detection is ENV-ONLY on purpose: probing SparkConf() in-process
    # is unreliable — after a context stops, its spark.master lingers
    # in the JVM-side defaults, and every later get_spark(cores=N)
    # would silently reuse the OLD core count (measured: a "4-core"
    # session running local[1]).
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None and not explicit_cores:
        master = os.environ.get("MASTER")
    if master is None:
        master = f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # syscalls are expensive in this environment (measured 70% sys
        # time in JVM<->python pipes) — large Arrow batches and socket
        # buffers cut the syscall count ~2x on Arrow-UDF stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")
        .config("spark.buffer.size", "1048576")
        # NOTE: a giant local-mode heap is an anti-optimization — measured
        # on this box, 32-thread shuffles run 5-25x slower at 48g+G1 than
        # at 8-12g+ParallelGC (GC scaling dominates tiny tasks); 12g
        # comfortably fits sf0.1 work.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # File creation is very expensive in this environment (~350us,
        # globally serialized). Bypass-merge shuffle creates maps*reducers
        # files; force the sort-based writer (1 data + 1 index file per
        # map task) so shuffles don't serialize on open().
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def empty_df(spark: SparkSession, schema):
    """Empty DataFrame that plans as ``LocalRelation <empty>``.

    ``spark.createDataFrame([], schema)`` plans a LogicalRDD over an
    empty RDD, and every ``collect()`` of it schedules one Spark job —
    ~0.3 s of pure scheduling on a 32-core local session for zero
    rows. An empty Arrow table takes the Arrow conversion path and
    becomes a LocalRelation, which collects driver-side with no job
    (measured 0.30 s/1 job -> 0.024 s/0 jobs). Falls back to the RDD
    construction if the Arrow conversion is unavailable.
    """
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType, _parse_datatype_string

        if isinstance(schema, str):
            schema = _parse_datatype_string(schema)
        assert isinstance(schema, StructType)
        return spark.createDataFrame(
            pa.Table.from_pylist([], schema=to_arrow_schema(schema))
        )
    except Exception:
        return spark.createDataFrame([], schema)
