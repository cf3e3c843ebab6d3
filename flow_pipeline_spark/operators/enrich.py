"""Flow enrichment — the processor the reference *describes* but never
ships (README.md:44-51: "IP addresses can be mapped to countries, ASN or
customer information"); the generated proto reserves its output columns
(SrcCountry/DstCountry/SrcASDB/DstASDB, pb-ext/flow.pb.go:140-143).

Two join shapes:
- ``enrich_by_asn``: equi-join on AS number against a small dimension —
  broadcast, zero shuffle on the fact.
- ``enrich_by_prefix``: longest-prefix IP→(ASN, country) match — a range
  join (dim.ip_start ≤ addr ≤ dim.ip_end). Naive range joins explode to
  BroadcastNestedLoopJoin; the scale trick is a **coarse-bucket equi-join**:
  both sides key on the first B bytes of the address, so Spark hash-joins
  on the bucket and only range-compares within a bucket. Prefixes wider
  than the bucket (rare, e.g. /8s when bucketing on 2 bytes) are expanded
  into multiple bucket rows on the (tiny, broadcast) dimension side —
  standard IP-geolocation join design. Longest-prefix wins via a
  max_by/row_number on prefix length.

Binary addresses compare bytewise in Spark (BinaryType comparison is
unsigned lexicographic), so 16-byte addresses order correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def enrich_by_asn(flows: DataFrame, asn_dim: DataFrame) -> DataFrame:
    """Fill SrcCountry/DstCountry/SrcASDB/DstASDB from an AS-keyed dim
    (asn, country, as_name). Left joins preserve unmatched flows (enrichment
    never drops traffic)."""
    src = F.broadcast(asn_dim.select(
        F.col("asn").alias("SrcAS_key"),
        F.col("country").alias("SrcCountry"),
        F.col("asn").alias("SrcASDB")))
    dst = F.broadcast(asn_dim.select(
        F.col("asn").alias("DstAS_key"),
        F.col("country").alias("DstCountry"),
        F.col("asn").alias("DstASDB")))
    return (
        flows
        .join(src, flows.SrcAS == src.SrcAS_key, "left").drop("SrcAS_key")
        .join(dst, flows.DstAS == dst.DstAS_key, "left").drop("DstAS_key")
    )


def expand_prefix_dim(prefix_dim: DataFrame, bucket_bytes: int = 1) -> DataFrame:
    """Explode each (ip_start, ip_end) range into one row per coarse bucket
    it spans (bucket = first ``bucket_bytes`` bytes of the address).

    The dimension is small (thousands–millions of prefixes); expansion
    multiplies only rows spanning multiple buckets. Runs once, then
    broadcast."""
    start_b = F.conv(F.hex(F.substring("ip_start", 1, bucket_bytes)), 16, 10).cast("long")
    end_b = F.conv(F.hex(F.substring("ip_end", 1, bucket_bytes)), 16, 10).cast("long")
    return (
        prefix_dim
        .withColumn("bucket", F.explode(F.sequence(start_b, end_b)))
    )


def enrich_by_prefix(flows: DataFrame, prefix_dim: DataFrame, *,
                     addr_col: str = "SrcAddr", bucket_bytes: int = 1,
                     out_prefix: str = "Src") -> DataFrame:
    """Longest-prefix range join: flows.addr ∈ [ip_start, ip_end].

    prefix_dim columns: ip_start BINARY(16), ip_end BINARY(16),
    prefix_len INT, asn INT, country STRING (FIXTURES.md F4).

    Plan shape: equi-join on the coarse bucket (hash join, broadcast dim) +
    range predicate within bucket + longest-prefix row_number. The fact
    table never shuffles (broadcast side carries the buckets)."""
    dim = expand_prefix_dim(prefix_dim, bucket_bytes)
    fact_bucket = F.conv(
        F.hex(F.substring(F.col(addr_col), 1, bucket_bytes)), 16, 10).cast("long")
    f = flows.withColumn("__bucket", fact_bucket).withColumn(
        "__row_id", F.monotonically_increasing_id())
    joined = (
        f.join(F.broadcast(dim),
               (f["__bucket"] == dim["bucket"])
               & (F.col(addr_col) >= dim["ip_start"])
               & (F.col(addr_col) <= dim["ip_end"]),
               "left")
    )
    # longest prefix wins; ties impossible in well-formed dims
    w = W.partitionBy("__row_id").orderBy(F.desc_nulls_last("prefix_len"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(f"{out_prefix}Country", F.col("country"))
        .withColumn(f"{out_prefix}ASDB", F.col("asn"))
        .drop("bucket", "ip_start", "ip_end", "prefix_len", "asn", "country",
              "as_name", "__bucket", "__rn", "__row_id")
    )
