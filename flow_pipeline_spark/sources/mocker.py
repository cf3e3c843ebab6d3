"""Synthetic flow-record source — batch and streaming.

Reproduces the reference mocker's value domains (mocker/mocker.go:54-107):
one record every ``freq + U[0, rand)`` ms; Bytes ~ U[0,1500), Packets ~
U[0,100), Src/DstAS ~ 65000 + U{0,1,2}, SrcAddr/DstAddr = 2001:db8:0:1::/112
with a random last byte, EType = 0x86DD, ports ~ U[0,65536), SamplingRate=1,
SequenceNum monotonically increasing, TimeFlowStart == TimeReceived.

Our generator additionally emits an **IPv4 stratum** (FIXTURES.md F1): first
4 bytes = IPv4, bytes 5-16 zero (the goflow left-aligned layout, reference
README.md:186-202), EType = 0x800 — the reference's production input has
both families even though the mocker emits only v6.

Generation is fully deterministic (seeded, fixed epoch base, no wall clock)
and distributed: rows are derived column-wise from ``spark.range`` — at
100 TB-scale a billion-row synthetic table parallelizes across executors
with zero driver involvement.  Determinism comes from xxhash64 of (seed,
row-id, field-tag) rather than an RNG stream, so any partition slice can be
generated independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1584912000  # 2020-03-22 21:20:00 UTC-ish, mocker-era fixed base


def _h(seed: int, tag: int) -> "F.Column":
    """Deterministic per-row u63 from (seed, row id, field tag)."""
    return F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(tag)))


def synthetic_flows(spark: SparkSession, n_rows: int = 10_000, *,
                    seed: int = 42, ipv4_fraction: float = 0.25,
                    base_epoch: int = BASE_EPOCH,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic flow table with the mocker's distributions.

    Timestamps advance by cumulative U[100,400) ms steps (mocker.go:56),
    truncated to seconds — approximated distributively as id * E[step] plus
    bounded per-row jitter, keeping timestamps non-decreasing without a
    window scan (a running cumulative sum would force a global sort;
    deterministic jitter ≡ same marginal distribution).
    """
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    ms = F.col("id") * 250 + (_h(seed, 1) % 300)  # mean step 250ms ≈ 100+U[0,300)
    ts = (F.lit(base_epoch) + (ms / 1000).cast("long"))
    return _flow_columns(df, ts, seed=seed, ipv4_fraction=ipv4_fraction)


def _flow_columns(df: DataFrame, ts: "F.Column", *, seed: int,
                  ipv4_fraction: float) -> DataFrame:
    """Project a frame having an ``id`` column into the mocker's flow record
    (shared by the batch generator and the streaming rate source)."""
    is_v4 = (_h(seed, 2) % 1_000_000) < int(ipv4_fraction * 1_000_000)

    # v6: 2001:db8:0:1:: | random last byte   (mocker.go:64-71)
    v6_prefix = b"\x20\x01\x0d\xb8\x00\x00\x00\x01\x00\x00\x00\x00\x00\x00\x00"
    last_byte = F.unhex(F.lpad(F.hex(_h(seed, 3) % 256), 2, "0"))
    v6_src = F.concat(F.lit(v6_prefix), last_byte)
    v6_dst = F.concat(F.lit(v6_prefix),
                      F.unhex(F.lpad(F.hex(_h(seed, 4) % 256), 2, "0")))
    # v4 stratum: 10.(0..3).x.y left-aligned, zero-padded (README.md:186-202)
    def v4_bytes(tag: int) -> "F.Column":
        return F.concat(
            F.lit(b"\x0a"),
            F.unhex(F.lpad(F.hex(_h(seed, tag) % 4), 2, "0")),
            F.unhex(F.lpad(F.hex(_h(seed, tag + 1) % 256), 2, "0")),
            F.unhex(F.lpad(F.hex(_h(seed, tag + 2) % 256), 2, "0")),
            F.lit(b"\x00" * 12),
        )

    sampler = F.concat(F.lit(b"\x0a\x00\x00"),
                       F.unhex(F.lpad(F.hex(_h(seed, 20) % 3 + 1), 2, "0")),
                       F.lit(b"\x00" * 12))

    return df.select(
        F.lit(0).alias("Type"),
        ts.alias("TimeReceived"),
        F.col("id").cast("int").alias("SequenceNum"),     # mocker.go:89-91
        F.when(_h(seed, 21) % 10 < 8, F.lit(1))
         .when(_h(seed, 21) % 10 < 9, F.lit(100))
         .otherwise(F.lit(1000)).cast("long").alias("SamplingRate"),
        sampler.alias("SamplerAddress"),
        ts.alias("TimeFlowStart"),                        # == TimeReceived
        ts.alias("TimeFlowEnd"),
        (_h(seed, 5) % 1500).alias("Bytes"),              # mocker.go:59
        (_h(seed, 6) % 100).alias("Packets"),             # mocker.go:60
        F.when(is_v4, v4_bytes(10)).otherwise(v6_src).alias("SrcAddr"),
        F.when(is_v4, v4_bytes(14)).otherwise(v6_dst).alias("DstAddr"),
        F.when(is_v4, F.lit(0x800)).otherwise(F.lit(0x86DD)).alias("Etype"),
        F.element_at(F.array(F.lit(6), F.lit(17), F.lit(1)),
                     (_h(seed, 7) % 3 + 1).cast("int")).alias("Proto"),
        (_h(seed, 8) % 65536).cast("int").alias("SrcPort"),   # rand & 0xFFFF
        (_h(seed, 9) % 65536).cast("int").alias("DstPort"),
        (65000 + _h(seed, 11) % 3).cast("int").alias("SrcAS"),  # mocker.go:61
        (65000 + _h(seed, 12) % 3).cast("int").alias("DstAS"),
    )


def mocker_stream(spark: SparkSession, *, rows_per_second: int = 4,
                  seed: int = 42, ipv4_fraction: float = 0.25) -> DataFrame:
    """S5 — the mocker as a streaming source (mocker/mocker.go:54-107).

    ``rate`` source (micro-batch) supplies (timestamp, value); value becomes
    the monotonically-increasing SequenceNum (mocker.go:89-91) and the flow
    columns are derived exactly as in the batch generator. The reference's
    default cadence ≈4 flows/s (BASELINE.md); crank rows_per_second for load
    tests — the rate source scales linearly across partitions.
    """
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(F.col("value").alias("id"), F.col("timestamp"))
    )
    ts = F.unix_timestamp("timestamp")  # wall-clock, as the mocker does
    # _flow_columns' select already projects only the flow columns
    return _flow_columns(src, ts, seed=seed, ipv4_fraction=ipv4_fraction)


def flows_raw(flows: DataFrame) -> DataFrame:
    """The raw-persist materialized-view projection (clickhouse
    create.sh:36-68): epoch seconds → timestamps, plus partition column
    ``Date = toDate(TimeReceived)``."""
    return (
        flows
        .withColumn("TimeReceived", F.timestamp_seconds("TimeReceived"))
        .withColumn("TimeFlowStart", F.timestamp_seconds("TimeFlowStart"))
        .withColumn("TimeFlowEnd", F.timestamp_seconds("TimeFlowEnd"))
        .withColumn("Date", F.to_date("TimeReceived"))
    )
