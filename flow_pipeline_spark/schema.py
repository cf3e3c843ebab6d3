"""Canonical flow-record schemas.

The reference declares the flow record four times (proto, ClickHouse DDL,
Postgres DDL, Go column list). We declare it once.

- ``FLOW_CORE_SCHEMA``: the "core" column set every reference table
  materializes — ClickHouse ``flows`` (reference compose/clickhouse/
  create.sh:5-27) == the fields of pb-ext/flow.proto:16-64.
- ``FLOW_FULL_SCHEMA``: the full decoder field set of the generated
  pb-ext/flow.pb.go:57-147 (MAC/VLAN/VRF, fragmentation, encap, MPLS, PPP,
  enrichment columns SrcCountry/DstCountry/SrcASDB/DstASDB).
- ``FLOW_PG_SCHEMA``: the 14-column row shape the Go inserter writes to
  Postgres (reference inserter/inserter.go:51-66, compose/postgres/
  create.sh:5-24).

Type mapping (SURVEY.md §1.3): u64→Long, u32→Int (Long where full u32 range
matters: AS numbers and sampling keep Int per mocker domains), 16-byte IP →
Binary, enum → Int.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- core: pb-ext/flow.proto:16-64 / clickhouse create.sh:5-27 -------------
FLOW_CORE_FIELDS = [
    _f("Type", T.IntegerType()),               # enum FlowType, flow.proto:9-15
    _f("TimeReceived", T.LongType()),          # epoch seconds
    _f("SequenceNum", T.IntegerType()),
    _f("SamplingRate", T.LongType()),
    _f("FlowDirection", T.IntegerType()),
    _f("SamplerAddress", T.BinaryType()),      # 16 bytes
    _f("TimeFlowStart", T.LongType()),
    _f("TimeFlowEnd", T.LongType()),
    _f("Bytes", T.LongType()),
    _f("Packets", T.LongType()),
    _f("SrcAddr", T.BinaryType()),             # 16 bytes, IPv4 left-aligned
    _f("DstAddr", T.BinaryType()),
    _f("Etype", T.IntegerType()),              # 0x800 v4 / 0x86DD v6
    _f("Proto", T.IntegerType()),
    _f("SrcPort", T.IntegerType()),
    _f("DstPort", T.IntegerType()),
    _f("InIf", T.IntegerType()),
    _f("OutIf", T.IntegerType()),
    _f("SrcMac", T.LongType()),
    _f("DstMac", T.LongType()),
    _f("SrcVlan", T.IntegerType()),
    _f("DstVlan", T.IntegerType()),
    _f("VlanId", T.IntegerType()),
    _f("IngressVrfID", T.IntegerType()),
    _f("EgressVrfID", T.IntegerType()),
    _f("IPTos", T.IntegerType()),
    _f("ForwardingStatus", T.IntegerType()),
    _f("IPTTL", T.IntegerType()),
    _f("TCPFlags", T.IntegerType()),
    _f("IcmpType", T.IntegerType()),
    _f("IcmpCode", T.IntegerType()),
    _f("IPv6FlowLabel", T.IntegerType()),
    _f("FragmentId", T.IntegerType()),
    _f("FragmentOffset", T.IntegerType()),
    _f("BiFlowDirection", T.IntegerType()),
    _f("SrcAS", T.IntegerType()),
    _f("DstAS", T.IntegerType()),
    _f("NextHop", T.BinaryType()),
    _f("NextHopAS", T.IntegerType()),
    _f("SrcNet", T.IntegerType()),
    _f("DstNet", T.IntegerType()),
]

FLOW_CORE_SCHEMA = T.StructType(FLOW_CORE_FIELDS)

# --- full decoder set: adds pb-ext/flow.pb.go:116-147 extras ---------------
FLOW_EXTRA_FIELDS = [
    _f("HasEncap", T.BooleanType()),
    _f("SrcAddrEncap", T.BinaryType()),
    _f("DstAddrEncap", T.BinaryType()),
    _f("ProtoEncap", T.IntegerType()),
    _f("EtypeEncap", T.IntegerType()),
    _f("IPTosEncap", T.IntegerType()),
    _f("IPTTLEncap", T.IntegerType()),
    _f("IPv6FlowLabelEncap", T.IntegerType()),
    _f("FragmentIdEncap", T.IntegerType()),
    _f("FragmentOffsetEncap", T.IntegerType()),
    _f("HasMPLS", T.BooleanType()),
    _f("MPLSCount", T.IntegerType()),
    _f("MPLS1TTL", T.IntegerType()),
    _f("MPLS1Label", T.IntegerType()),
    _f("MPLS2TTL", T.IntegerType()),
    _f("MPLS2Label", T.IntegerType()),
    _f("MPLS3TTL", T.IntegerType()),
    _f("MPLS3Label", T.IntegerType()),
    _f("MPLSLastTTL", T.IntegerType()),
    _f("MPLSLastLabel", T.IntegerType()),
    _f("HasPPP", T.BooleanType()),
    _f("PPPAddressControl", T.IntegerType()),
    # enrichment outputs (reference README.md:44-51 describes the processor;
    # pb.go reserves the columns)
    _f("SrcCountry", T.StringType()),
    _f("DstCountry", T.StringType()),
    _f("SrcASDB", T.IntegerType()),
    _f("DstASDB", T.IntegerType()),
]

FLOW_FULL_SCHEMA = T.StructType(FLOW_CORE_FIELDS + FLOW_EXTRA_FIELDS)

# --- Postgres-path projection: inserter/inserter.go:51-66 ------------------
FLOW_PG_COLUMNS = [
    "date_inserted", "time_flow", "type", "sampling_rate",
    "src_ip", "dst_ip", "bytes", "packets",
    "src_port", "dst_port", "etype", "proto", "src_as", "dst_as",
]

FLOW_PG_SCHEMA = T.StructType([
    _f("date_inserted", T.TimestampType()),
    _f("time_flow", T.TimestampType()),
    _f("type", T.IntegerType()),
    _f("sampling_rate", T.IntegerType()),
    _f("src_ip", T.StringType()),
    _f("dst_ip", T.StringType()),
    _f("bytes", T.LongType()),
    _f("packets", T.LongType()),
    _f("src_port", T.IntegerType()),
    _f("dst_port", T.IntegerType()),
    _f("etype", T.IntegerType()),
    _f("proto", T.IntegerType()),
    _f("src_as", T.LongType()),
    _f("dst_as", T.LongType()),
])

# flows_raw adds the partition/date columns (clickhouse create.sh:36-62):
# Date = to_date(TimeReceived); timestamps become TimestampType.
