"""Time-bucketing expressions matching the reference's three granularities.

- ``toStartOfMinute`` (viz-ch.json:74) — 1-minute dashboard buckets
- ``toStartOfFiveMinute`` (clickhouse create.sh:96) — the 5-min rollup slot
- ``intDiv(epoch, 30) * 30`` (viz.json:62) — 30-s Postgres dashboard buckets

All are pure JVM expressions (date_trunc / epoch arithmetic) so they stay
inside whole-stage codegen and vectorize over parquet scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_start_of_minute(ts: Column) -> Column:
    """≡ ClickHouse ``toStartOfMinute(ts)``."""
    return F.date_trunc("minute", ts)


def to_start_of_five_minute(ts: Column) -> Column:
    """≡ ClickHouse ``toStartOfFiveMinute(ts)`` (create.sh:96)."""
    return to_start_of_interval(ts, 300)


def to_start_of_interval(ts: Column, seconds: int) -> Column:
    """Generic tumbling bucket: epoch floor-division, returned as timestamp.
    ≡ PG dashboard ``extract(epoch from ts)::int/N*N`` (viz.json:62)."""
    epoch = F.unix_timestamp(ts)
    return F.timestamp_seconds((epoch / seconds).cast("long") * seconds)
