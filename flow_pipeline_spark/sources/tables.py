"""Parquet table loaders for the driver-generated test warehouse.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an sf dir.

At 100 TB these reads become partitioned-directory scans; everything here
goes through ``spark.read.parquet`` so predicate pushdown / column pruning /
partition pruning apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Self-configure on whatever session the caller (e.g. the verify driver)
    # passes in: events.parquet carries TIMESTAMP(NANOS) which Spark rejects
    # unless read as long, and time-bucketing semantics assume UTC.
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    # TIMESTAMP(NANOS) parquet columns surface as nanos-since-epoch longs
    # (spark.sql.legacy.parquet.nanosAsLong) — convert to TimestampType with
    # microsecond truncation, matching DuckDB's ns→us read of the same file.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries match the
    DuckDB oracle's pre-registered view names."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
