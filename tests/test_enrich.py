"""Enrichment join tests (J1): AS-keyed broadcast join and longest-prefix
IP range join against a pandas oracle."""

from __future__ import annotations

import ipaddress

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flow_pipeline_spark.operators.enrich import enrich_by_asn, enrich_by_prefix
from flow_pipeline_spark.sources.mocker import synthetic_flows


@pytest.fixture(scope="module")
def flows(spark):
    return synthetic_flows(spark, 3000, seed=13).cache()


def test_enrich_by_asn(spark, flows):
    dim = spark.createDataFrame(
        [(65000, "US", "AS-A"), (65001, "DE", "AS-B")],
        "asn int, country string, as_name string")
    out = enrich_by_asn(flows, dim)
    pdf = out.select("SrcAS", "SrcCountry", "DstAS", "DstCountry").toPandas()
    assert (pdf.loc[pdf.SrcAS == 65000, "SrcCountry"] == "US").all()
    assert (pdf.loc[pdf.SrcAS == 65001, "SrcCountry"] == "DE").all()
    assert pdf.loc[pdf.SrcAS == 65002, "SrcCountry"].isna().all()
    assert len(pdf) == flows.count()  # left join preserves all flows


def test_enrich_by_prefix_longest_match(spark, flows):
    schema = T.StructType([
        T.StructField("ip_start", T.BinaryType()),
        T.StructField("ip_end", T.BinaryType()),
        T.StructField("prefix_len", T.IntegerType()),
        T.StructField("asn", T.IntegerType()),
        T.StructField("country", T.StringType()),
    ])
    rows = [
        # the v6 mocker prefix 2001:db8:0:1::/64 — broad match
        (bytearray(ipaddress.ip_network("2001:db8:0:1::/64")[0].packed),
         bytearray(ipaddress.ip_network("2001:db8:0:1::/64")[-1].packed),
         64, 64500, "EU"),
        # narrower /120 inside it (last-byte 0x00-0xff range restricted)
        (bytearray(ipaddress.IPv6Address("2001:db8:0:1::").packed),
         bytearray(ipaddress.IPv6Address("2001:db8:0:1::7f").packed),
         120, 64501, "DE"),
        # v4 goflow-layout stratum 10.0.0.0/8 left-aligned
        (bytearray(bytes([10, 0, 0, 0]) + b"\x00" * 12),
         bytearray(bytes([10, 255, 255, 255]) + b"\x00" * 12),
         8, 64502, "US"),
    ]
    dim = spark.createDataFrame(rows, schema)
    out = enrich_by_prefix(flows, dim, addr_col="SrcAddr", out_prefix="Src")
    assert out.count() == flows.count()  # no row duplication/loss
    pdf = out.select("SrcAddr", "Etype", "SrcCountry", "SrcASDB").toPandas()
    for _, r in pdf.iterrows():
        b = bytes(r["SrcAddr"])
        if r["Etype"] == 0x800:
            assert r["SrcCountry"] == "US" and r["SrcASDB"] == 64502, b.hex()
        else:
            # v6: last byte <= 0x7f → narrower /120 wins (longest prefix)
            want = ("DE", 64501) if b[15] <= 0x7F else ("EU", 64500)
            assert (r["SrcCountry"], r["SrcASDB"]) == want, b.hex()
