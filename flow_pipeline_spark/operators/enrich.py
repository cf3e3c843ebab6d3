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


def flatten_prefix_dim(prefix_dim: DataFrame) -> DataFrame:
    """Resolve longest-prefix-match AT DIM BUILD TIME: decompose the
    (possibly nested/overlapping) prefix ranges into DISJOINT atomic
    intervals, each owned by its longest covering prefix.

    Sweep construction, all on the (small) dim: the distinct boundary
    points p1<…<pm cut the space into point intervals [p,p] and open gaps
    (p_i, p_{i+1}); no prefix boundary falls inside an atomic interval, so
    a prefix covers an interval iff start ≤ lo and end ≥ hi — a small×small
    containment join, then max_by(prefix_len) per interval. Output columns:
    lo, hi (BINARY), lo_open, hi_open, prefix_len, asn, country.

    Why: any address matches AT MOST ONE disjoint interval, so the fact
    join needs no post-join longest-prefix reduction — a row_number/group
    reduction there would shuffle the whole fact table.
    """
    starts = prefix_dim.select(F.col("ip_start").alias("p"))
    ends = prefix_dim.select(F.col("ip_end").alias("p"))
    points = starts.unionByName(ends).distinct()
    # DIM-SIZE GUARD: this unpartitioned window is a deliberate single-task
    # sweep over the 2·|dim| boundary points — it runs ONCE at dim build
    # time and the global BGP table is ~1M prefixes, far below single-task
    # limits. It must never be pointed at fact-scale data; if prefix dims
    # ever grow past ~100M boundaries, replace with a repartitionByRange
    # sweep that hands the last point of each range to its successor.
    w = W.orderBy("p")
    pts = points.select("p", F.lead("p").over(w).alias("p_next"))

    point_iv = pts.select(
        F.col("p").alias("lo"), F.col("p").alias("hi"),
        F.lit(False).alias("lo_open"), F.lit(False).alias("hi_open"))
    gap_iv = (pts.filter(F.col("p_next").isNotNull())
              .select(F.col("p").alias("lo"), F.col("p_next").alias("hi"),
                      F.lit(True).alias("lo_open"),
                      F.lit(True).alias("hi_open")))
    atoms = point_iv.unionByName(gap_iv)

    owned = (
        atoms.join(
            prefix_dim,
            (prefix_dim["ip_start"] <= atoms["lo"])
            & (prefix_dim["ip_end"] >= atoms["hi"]), "inner")
        .groupBy("lo", "hi", "lo_open", "hi_open")
        .agg(F.max_by(
            F.struct("prefix_len", "asn", "country"),
            F.struct("prefix_len", "asn")).alias("own"))
        .select("lo", "hi", "lo_open", "hi_open",
                F.col("own.prefix_len").alias("prefix_len"),
                F.col("own.asn").alias("asn"),
                F.col("own.country").alias("country"))
    )
    return owned


def _expand_interval_buckets(intervals: DataFrame,
                             bucket_bytes: int = 1) -> DataFrame:
    lo_b = F.conv(F.hex(F.substring("lo", 1, bucket_bytes)), 16, 10).cast("long")
    hi_b = F.conv(F.hex(F.substring("hi", 1, bucket_bytes)), 16, 10).cast("long")
    return intervals.withColumn("bucket", F.explode(F.sequence(lo_b, hi_b)))


def enrich_by_prefix(flows: DataFrame, prefix_dim: DataFrame, *,
                     addr_col: str = "SrcAddr", bucket_bytes: int = 1,
                     out_prefix: str = "Src") -> DataFrame:
    """Longest-prefix range join: flows.addr ∈ [ip_start, ip_end].

    prefix_dim columns: ip_start BINARY(16), ip_end BINARY(16),
    prefix_len INT, asn INT, country STRING (FIXTURES.md F4).

    Plan shape: the dim is flattened into disjoint longest-prefix-owned
    intervals (flatten_prefix_dim, dim-side, once), bucket-expanded, and
    broadcast; the fact side is ONE equi-join on the coarse bucket plus
    range predicates — at most one match per row by construction, so there
    is NO post-join window/group reduction and the fact table never
    shuffles. (The previous design row_numbered per fact row, which
    shuffled the entire joined fact — the exact cliff this avoids.)"""
    dim = F.broadcast(_expand_interval_buckets(flatten_prefix_dim(prefix_dim),
                                               bucket_bytes))
    fact_bucket = F.conv(
        F.hex(F.substring(F.col(addr_col), 1, bucket_bytes)), 16, 10).cast("long")
    f = flows.withColumn("__bucket", fact_bucket)
    addr = F.col(addr_col)
    in_lo = (addr > F.col("lo")) | ((addr == F.col("lo")) & ~F.col("lo_open"))
    in_hi = (addr < F.col("hi")) | ((addr == F.col("hi")) & ~F.col("hi_open"))
    joined = f.join(dim, (f["__bucket"] == dim["bucket"]) & in_lo & in_hi,
                    "left")
    return (
        joined
        .withColumn(f"{out_prefix}Country", F.col("country"))
        .withColumn(f"{out_prefix}ASDB", F.col("asn"))
        .drop("bucket", "lo", "hi", "lo_open", "hi_open", "prefix_len",
              "asn", "country", "__bucket")
    )
