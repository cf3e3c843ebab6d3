"""The flows_5m rollup family — the reference's SummingMergeTree tier.

Reference semantics (compose/clickhouse/create.sh:70-110, README.md:164-183):
- ``flows_5m_view`` groups each inserted block by
  ``(Date, Timeslot=toStartOfFiveMinute(TimeReceived), SrcAS, DstAS,
  ETypeMap.EType)`` with ``sum(Bytes), sum(Packets), count()`` and the
  per-EType sub-sums carried as parallel Nested arrays
  (``ETypeMap.EType/Bytes/Packets/Count``, create.sh:78-83,100-103).
- The table stores PARTIAL sums; background merges (or ``OPTIMIZE TABLE``)
  combine rows sharing the sort key. Readers must re-aggregate or OPTIMIZE
  first — unbounded lateness is tolerated (SURVEY §2.6 W5).

Spark design:
- ``build_rollup_5m``: one shuffle to (slot, SrcAS, DstAS, EType) partial
  sums — Catalyst already does partial+final aggregation map-side — then a
  cheap second agg to reconstruct the Nested shape as a sorted
  array<struct<EType,Bytes,Packets,Count>> (canonical form of ClickHouse's
  parallel arrays; order fixed by EType so results hash stably).
- ``compact_rollup``: the OPTIMIZE-equivalent — idempotent re-aggregation of
  stored partials, safe to run anytime, any number of times.
- ``route_traffic_query``: answers eligible aggregates from the rollup
  instead of raw (the reference does this by hand-pointing dashboards at
  flows_5m; Spark won't rewrite automatically — SURVEY §4).

Scale: the rollup is ~|5-min slots| × |AS pairs| × |ETypes| rows — orders of
magnitude smaller than raw. At 100 TB raw, the rollup still fits a single
executor's memory per Date partition; compaction is partition-parallel with
no cross-Date shuffle (Date is in every group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import to_start_of_five_minute

ROLLUP_KEY = ["Date", "Timeslot", "SrcAS", "DstAS"]
SUB_KEY = "EType"


def build_rollup_5m(flows_raw: DataFrame) -> DataFrame:
    """flows_raw → flows_5m rows (fully merged form).

    Output schema mirrors create.sh:70-90: group key + ETypeMap
    array<struct> + total Bytes/Packets/Count.
    """
    per_etype = (
        flows_raw
        .groupBy(
            F.col("Date"),
            to_start_of_five_minute(F.col("TimeReceived")).alias("Timeslot"),
            F.col("SrcAS"), F.col("DstAS"),
            F.col("Etype").alias(SUB_KEY),
        )
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count("*").alias("Count"))
    )
    return (
        per_etype
        .groupBy(*ROLLUP_KEY)
        .agg(
            F.sort_array(F.collect_list(F.struct(
                SUB_KEY, "Bytes", "Packets", "Count"))).alias("ETypeMap"),
            F.sum("Bytes").alias("Bytes"),
            F.sum("Packets").alias("Packets"),
            F.sum("Count").alias("Count"),
        )
    )


def rollup_flat(flows_raw: DataFrame) -> DataFrame:
    """The flat (EType-in-key) form — informationally equivalent to the
    Nested shape (SURVEY §2.3 A8) and the natural stored layout: stays
    fully columnar, no array construction on the write path."""
    return (
        flows_raw
        .groupBy(
            F.col("Date"),
            to_start_of_five_minute(F.col("TimeReceived")).alias("Timeslot"),
            F.col("SrcAS"), F.col("DstAS"),
            F.col("Etype").alias(SUB_KEY),
        )
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count(F.lit(1)).alias("Count"))
    )


def compact_rollup(partials: DataFrame) -> DataFrame:
    """OPTIMIZE-equivalent (README.md:164-173): merge stored partial rows
    sharing the sort key by re-summing. Idempotent — compacted input is a
    fixed point. Works on the flat form."""
    return (
        partials
        .groupBy(*ROLLUP_KEY, SUB_KEY)
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.sum("Count").alias("Count"))
    )


def rollup_invariant_check(flows_raw: DataFrame, partials: DataFrame) -> bool:
    """The SummingMergeTree guarantee: fully-compacted rollup ≡ direct
    re-aggregation of raw (FIXTURES.md F6)."""
    a = compact_rollup(partials)
    b = rollup_flat(flows_raw)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def route_traffic_query(flows_raw: DataFrame, rollup: DataFrame | None,
                        group_cols: list[str], *, interval_s: int = 300
                        ) -> DataFrame:
    """Answer ``sum(Bytes)/sum(Packets)/count per (time bucket, keys)`` from
    the rollup when eligible, else from raw.

    Eligible ⇔ a rollup is available, requested keys ⊆ rollup keys, and the
    bucket is a multiple of 5 minutes (create.sh:96 granularity).
    """
    from ..functions.timeutil import to_start_of_interval

    eligible = (
        rollup is not None
        and interval_s % 300 == 0
        and set(group_cols) <= {"Date", "SrcAS", "DstAS", SUB_KEY}
    )
    if eligible:
        # sum is associative, so partials need no compaction pass first:
        # grouping the stored partial rows straight into the requested
        # bucket is one shuffle instead of two, same result
        bucket = to_start_of_interval(F.col("Timeslot"), interval_s)
        return (
            rollup.groupBy(bucket.alias("t"), *group_cols)
            .agg(F.sum("Bytes").alias("Bytes"),
                 F.sum("Packets").alias("Packets"),
                 F.sum("Count").alias("Count"))
        )
    bucket = to_start_of_interval(F.col("TimeReceived"), interval_s)
    return (
        flows_raw.groupBy(bucket.alias("t"), *group_cols)
        .agg(F.sum("Bytes").alias("Bytes"),
             F.sum("Packets").alias("Packets"),
             F.count(F.lit(1)).alias("Count"))
    )
