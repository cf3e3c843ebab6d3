"""Flow-dashboard query builders — bit-parity with the reference's Grafana
SQL, operating on a ``flows_raw`` DataFrame (see sources.mocker.flows_raw).

Sources: compose/grafana/dashboards/viz-ch.json (ClickHouse variant, panels
at lines 74, 233, 358, 479, 604), viz.json (Postgres variant, 30-s buckets),
README.md:144-183 (CLI session queries).

All builders take the flows_raw DataFrame (TimeReceived/TimeFlowStart as
timestamps, Date column present) and return DataFrames with the dashboard's
column names. Ordering: the dashboards rely on Grafana UI sorting for ties —
we append explicit tie-break keys so results are deterministic (FIXTURES.md
F6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ip import flow_addr_to_string
from ..functions.timeutil import (
    to_start_of_five_minute,
    to_start_of_interval,
    to_start_of_minute,
)

def instant_traffic(flows_raw: DataFrame) -> DataFrame:
    """viz-ch.json:74 — 'Instant traffic':
    ``SELECT toUInt64(toStartOfMinute(ts))*1000 AS t,
    sum(Bytes*SamplingRate) AS sumbytes GROUP BY t ORDER BY t``."""
    t = (F.unix_timestamp(to_start_of_minute(F.col("TimeReceived"))) * 1000)
    return (
        flows_raw.groupBy(t.alias("t"))
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("sumbytes"))
        .orderBy("t")
    )


def _top_by_traffic(flows_raw: DataFrame, key: Column, key_name: str,
                    k: int | None) -> DataFrame:
    out = (
        flows_raw.groupBy(key.alias(key_name))
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("sumbytes"))
        .orderBy(F.desc("sumbytes"), F.asc(key_name))
    )
    # k=0 must mean an EMPTY top-0, not 'no limit' (round-7 review:
    # the falsy check turned a zero-sized panel into a full-table
    # ordered materialization); None alone means unlimited
    return out.limit(k) if k is not None else out


def _top_by_addr_traffic(flows_raw: DataFrame, addr_col: str, key_name: str,
                         k: int | None) -> DataFrame:
    """Render-AFTER-aggregate form of the IP panels.

    The dashboard groups by the rendered string, whose IPv6 arm is a pandas
    UDF (functions/ip.py) — putting that render in the group-by key would
    push every raw row across the Arrow boundary at scale. Instead:
    (1) aggregate natively on the raw ``(addr, Etype)`` bytes (codegen hash
    aggregate, map-side partials), (2) render the surviving |distinct addrs|
    rows — the UDF input shrinks from |rows| to |keys|, (3) re-aggregate by
    the rendered string (distinct (addr, etype) pairs can collide post-
    render, e.g. a v4-mapped render equal to another addr's dotted quad), so
    results stay bit-identical to the render-first form. The second shuffle
    carries only pre-aggregated key rows.
    """
    pre = (
        flows_raw.groupBy(F.col(addr_col).alias("_addr"),
                          F.col("Etype").alias("_etype"))
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("_sb"))
    )
    if k is None:
        # unlimited panel: every group publishes, so every group renders
        out = (
            pre.groupBy(flow_addr_to_string(F.col("_addr"),
                                            F.col("_etype"))
                        .alias(key_name))
            .agg(F.sum("_sb").alias("sumbytes"))
            .orderBy(F.desc("sumbytes"), F.asc(key_name))
        )
        return out
    # Top-k panel (round-11, guide §4): the render's fibers are exactly
    # computable as a cheap JVM canonical key, so the re-aggregate and
    # the top-k cut run NATIVELY and only the k publishing rows (+
    # sumbytes ties at the boundary) cross the Python boundary — the
    # ArrowEvalPython input drops from |distinct addrs| to ~k. The
    # canonical key is render-exact because (a) the v4 arm is a pure
    # function of the first-4-bytes u32, (b) the v6 arm (RFC-5952
    # compressed hex — no dotted v4-mapped form) is injective in the
    # kernel's NORMALIZED 16 bytes (pad/truncate; None/empty -> NULL),
    # and (c) the arms can never collide (a v6 render always contains
    # ':', a dotted quad never does). NULL renders from either arm fold
    # into one arm-0 fiber, matching the old string group-by. Pinned by
    # the flows_top_src_ips oracle and
    # test_top_addr_render_after_topk_matches_render_all.
    from ..functions.ip import _ipv6_render, ipv4_from_flow_addr, \
        ipv4_num_to_string

    is_v4 = F.col("_etype").eqNullSafe(F.lit(0x800))
    v4num = ipv4_from_flow_addr(F.col("_addr"))
    norm16 = F.when(
        F.length("_addr") != 0,
        F.substring(F.concat(F.col("_addr"), F.lit(b"\x00" * 16)), 1, 16))
    arm = (F.when(is_v4 & v4num.isNotNull(), F.lit(1))
           .when(~is_v4 & norm16.isNotNull(), F.lit(2))
           .otherwise(F.lit(0)))
    canon = (pre.select(
        arm.alias("_arm"),
        F.when(arm == 1, v4num).alias("_v4num"),
        F.when(arm == 2, norm16).alias("_v6b"),
        F.col("_sb"))
        .groupBy("_arm", "_v4num", "_v6b")
        .agg(F.sum("_sb").alias("sumbytes")))
    from pyspark.sql import Window as W

    # rank (not row_number): ties at the k-th sum must survive to the
    # render, because the final tie-break is on the RENDERED string.
    # WindowGroupLimit prefilters per partition, so the empty
    # partitionBy is not a full-table single-reducer sort.
    cand = (canon.withColumn(
        "_rk", F.rank().over(W.orderBy(F.desc("sumbytes"))))
        .filter(F.col("_rk") <= k))
    rendered = (F.when(F.col("_arm") == 1,
                       ipv4_num_to_string(F.col("_v4num")))
                .when(F.col("_arm") == 2, _ipv6_render(F.col("_v6b")))
                .otherwise(F.lit(None).cast("string")))
    # k=0 must mean an EMPTY top-0, not 'no limit' (round-7 review:
    # the falsy check turned a zero-sized panel into a full-table
    # ordered materialization); None alone means unlimited
    return (cand.select(rendered.alias(key_name), F.col("sumbytes"))
            .orderBy(F.desc("sumbytes"), F.asc(key_name))
            .limit(k))


def top_src_ips(flows_raw: DataFrame, k: int | None = 10) -> DataFrame:
    """viz-ch.json:233 — 'Top source IPs': group by the dual-rendered
    address string (IPv4 decode when EType=0x800, IPv6 otherwise)."""
    return _top_by_addr_traffic(flows_raw, "SrcAddr", "srcip", k)


def top_dst_ips(flows_raw: DataFrame, k: int | None = 10) -> DataFrame:
    """viz-ch.json:479 — 'Top destination IPs'."""
    return _top_by_addr_traffic(flows_raw, "DstAddr", "dstip", k)


def top_src_ports(flows_raw: DataFrame, k: int | None = 10) -> DataFrame:
    """viz-ch.json:358 — 'Top source ports'."""
    return _top_by_traffic(flows_raw, F.col("SrcPort"), "port", k)


def top_dst_ports(flows_raw: DataFrame, k: int | None = 10) -> DataFrame:
    """viz-ch.json:604 — 'Top destination ports'."""
    return _top_by_traffic(flows_raw, F.col("DstPort"), "port", k)


def rate_30s_bits(flows_raw: DataFrame) -> DataFrame:
    """viz.json:62 (Postgres dashboard) — 30-s buckets,
    ``sum(bytes*sampling_rate*8)/30`` bits/sec."""
    t = to_start_of_interval(F.col("TimeReceived"), 30)
    return (
        flows_raw.groupBy(t.alias("t"))
        .agg((F.sum(F.col("Bytes") * F.col("SamplingRate") * 8) / 30)
             .alias("bits_per_sec"))
        .orderBy("t")
    )


def as_pair_traffic(flows_raw: DataFrame) -> DataFrame:
    """README.md:174-183 — per-(SrcAS, DstAS) traffic."""
    return (
        flows_raw.groupBy("SrcAS", "DstAS")
        .agg(F.sum(F.col("Bytes") * F.col("SamplingRate")).alias("sumbytes"),
             F.count("*").alias("n"))
        .orderBy("SrcAS", "DstAS")
    )


def sample_scan(flows_raw: DataFrame, limit: int = 20) -> DataFrame:
    """README.md:144-161 — projection + dual IP render + time order."""
    return (
        flows_raw.select(
            "TimeReceived",
            flow_addr_to_string(F.col("SrcAddr"), F.col("Etype")).alias("SrcIP"),
            flow_addr_to_string(F.col("DstAddr"), F.col("Etype")).alias("DstIP"),
            "SrcPort", "DstPort", "Bytes", "Packets",
        )
        .orderBy("TimeReceived", "SrcPort")
        .limit(limit)
    )
