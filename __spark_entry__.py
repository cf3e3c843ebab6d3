"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes the
SURVEY.md §2 operator inventory as (spark, sf_dir) -> DataFrame builders;
``oracle_sql()`` gives the DuckDB-equivalent SQL per query.
Implementation lives in ``flow_pipeline_spark.plans.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flow_pipeline_spark.plans import QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query ('instant traffic', viz-ch.json:74 analog) at sf0.001."""
    return QUERIES["instant_traffic_1m"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items()
            if qd.oracle is not None}
