"""IP library unit tests — golden vectors from reference README.md:192-215
(FIXTURES.md F5) plus round-trips over both storage layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from flow_pipeline_spark.functions.ip import (
    flow_addr_to_string,
    go_ip_to_string,
    ipv4_from_flow_addr,
    ipv4_num_to_string,
    ipv4_string_to_num,
    ipv6_num_to_string,
    ipv6_string_to_num,
    reinterpret_u32_as_bytes16,
)

GOFLOW_V4 = bytes([192, 168, 1, 1]) + b"\x00" * 12          # network-order, left-aligned
V6 = bytes.fromhex("20010db8000000010000000000000000") [:15] + b"\x9c"  # 2001:db8:0:1::9c


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_readme_vector_roundtrip(spark):
    """'192.168.1.1' ↔ 3232235777 ↔ '101:a8c0::' (README.md:192-215)."""
    num = _one(spark, ipv4_string_to_num(F.lit("192.168.1.1")))
    assert num == 3232235777
    # CH demo layout: u32 little-endian bytes zero-padded to 16
    b16 = _one(spark, reinterpret_u32_as_bytes16(F.lit(3232235777)))
    assert bytes(b16) == bytes([1, 1, 168, 192]) + b"\x00" * 12
    rendered = _one(spark, ipv6_num_to_string(F.lit(bytes(b16))))
    assert rendered == "101:a8c0::"
    assert _one(spark, ipv4_num_to_string(F.lit(3232235777))) == "192.168.1.1"


def test_dashboard_decode_goflow_layout(spark):
    """IPv4NumToString(reinterpretAsUInt32(substring(reverse(addr),13,4)))
    (viz-ch.json:233) recovers 192.168.1.1 from goflow's left-aligned
    network-order layout."""
    num = _one(spark, ipv4_from_flow_addr(F.lit(GOFLOW_V4)))
    assert num == 3232235777
    assert _one(
        spark, ipv4_num_to_string(ipv4_from_flow_addr(F.lit(GOFLOW_V4)))
    ) == "192.168.1.1"


def test_ipv6_render_compression(spark):
    assert _one(spark, ipv6_num_to_string(F.lit(V6))) == "2001:db8:0:1::9c"
    # no single-group compression (RFC 5952), lowercase hex
    addr = bytes.fromhex("20010db8000000000001000200030004")
    assert _one(spark, ipv6_num_to_string(F.lit(addr))) == "2001:db8::1:2:3:4"


def test_ipv6_parse_roundtrip(spark):
    got = _one(spark, ipv6_string_to_num(F.lit("2001:db8:0:1::9c")))
    assert bytes(got) == V6


def test_flow_addr_dual_render(spark):
    df = spark.createDataFrame(
        [(GOFLOW_V4, 0x800), (V6, 0x86DD)], "addr binary, etype int")
    got = [r["ip"] for r in df.select(
        flow_addr_to_string(F.col("addr"), F.col("etype")).alias("ip")
    ).collect()]
    assert got == ["192.168.1.1", "2001:db8:0:1::9c"]


def test_go_ip_render(spark):
    """inserter.go:131-140 semantics: nil → 0.0.0.0; 16-byte non-mapped
    renders as IPv6 (Go does NOT detect the left-aligned quirk)."""
    mapped = b"\x00" * 10 + b"\xff\xff" + bytes([10, 0, 0, 1])
    df = spark.createDataFrame(
        [(None,), (b"",), (bytes([10, 0, 0, 1]),), (mapped,), (GOFLOW_V4,)],
        "addr binary")
    got = [r["ip"] for r in df.select(
        go_ip_to_string(F.col("addr")).alias("ip")).collect()]
    assert got == ["0.0.0.0", "0.0.0.0", "10.0.0.1", "10.0.0.1", "c0a8:101::"]


def test_sql_registered_functions(spark):
    """SURVEY §2.7 — the IP library callable from spark.sql, matching the
    expression forms and the README golden vectors."""
    from flow_pipeline_spark.functions.ip import register_sql_functions
    register_sql_functions(spark)
    row = spark.sql("""
        SELECT ipv4_num_to_string(3232235777L)          AS v4s,
               ipv4_string_to_num('192.168.1.1')        AS v4n,
               ipv6_num_to_string(ipv6_string_to_num('101:a8c0::')) AS v6rt,
               flow_addr_to_string(
                 ipv6_string_to_num('101:a8c0::'), 2048) AS dual
    """).collect()[0]
    assert row["v4s"] == "192.168.1.1"
    assert row["v4n"] == 3232235777
    assert row["v6rt"] == "101:a8c0::"
    # EType=0x800: first 4 bytes big-endian = 01 01 a8 c0 = 1.1.168.192
    assert row["dual"] == "1.1.168.192"
    # Go net.IP.String() semantics (inserter.go:131-140) from SQL: nil
    # substitute, v4-mapped To4() quad, plain-16B RFC-5952
    go = spark.sql("""
        SELECT go_ip_to_string(CAST(NULL AS BINARY))               AS nil,
               go_ip_to_string(X'00000000000000000000FFFF0A000001') AS mapped,
               go_ip_to_string(ipv6_string_to_num('101:a8c0::'))    AS v6
    """).collect()[0]
    assert go["nil"] == "0.0.0.0"
    assert go["mapped"] == "10.0.0.1"
    assert go["v6"] == "101:a8c0::"


def test_null_address_renders_null_not_empty(spark):
    """Round-7 review: concat_ws SKIPS null args, so a NULL address
    rendered as '' — an empty-string bucket in dashboard group-bys,
    disagreeing with the registered SQL UDF of the same name. NULL must
    propagate through both arms of the dual render."""
    from flow_pipeline_spark.functions.ip import register_sql_functions

    df = spark.createDataFrame([(None, 0x800), (None, 0x86DD)],
                               "addr binary, etype int")
    got = [r["ip"] for r in df.select(
        flow_addr_to_string(F.col("addr"), F.col("etype")).alias("ip")
    ).collect()]
    assert got == [None, None]
    assert _one(spark,
                ipv4_num_to_string(F.lit(None).cast("long"))) is None
    register_sql_functions(spark)
    row = spark.sql("SELECT ipv4_num_to_string(CAST(NULL AS LONG)) AS a, "
                    "flow_addr_to_string(CAST(NULL AS BINARY), 2048) AS b"
                    ).collect()[0]
    assert row["a"] is None and row["b"] is None
