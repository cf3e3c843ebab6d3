"""SparkSession factory.

Local test profile runs on local[N]; the config is chosen so the same code
scales to a multi-executor cluster: AQE on (runtime shuffle re-planning,
skew-join splitting), shuffle partitions sized to cores locally (a cluster
deployment overrides via spark-submit conf), UTC session timezone so
time-bucketing is deterministic, Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flow_pipeline_spark", *, cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real cluster
    this function is bypassed by spark-submit; everything here is also safe
    as cluster-side defaults.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores in local mode; AQE coalesces further.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # dynamic-partition writes (raw persist partitionBy Date) otherwise
        # plan a per-task sort on the partition column; with few distinct
        # dates, concurrent writers skip the sort — ~3× ingest throughput.
        .config("spark.sql.maxConcurrentOutputFileWriters", "16")
        # testdata events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanos
        # type; read as long and convert in the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
