"""IP address expression library.

The reference stores addresses as raw 16 bytes regardless of family
(reference README.md:186-189): goflow writes an IPv4 into the FIRST 4 bytes
(network order) of the 16-byte field, zero-padded right. Dashboards decode
IPv4 with ``IPv4NumToString(reinterpretAsUInt32(substring(reverse(SrcAddr),
13, 4)))`` conditioned on ``EType = 0x800`` (reference
compose/grafana/dashboards/viz-ch.json:233,479); the Go inserter instead
renders with ``net.IP.String()`` and substitutes "0.0.0.0" for nil
(reference inserter/inserter.go:131-140).

reverse(16B) then bytes 13..16 reinterpreted little-endian ≡ the original
first 4 bytes read BIG-endian — so the hot-path decode is a pure JVM
expression here (no UDF): ``conv(hex(substring(addr, 1, 4)), 16, 10)``.

IPv6 rendering must match ClickHouse ``IPv6NumToString`` — RFC-5952-style
lowercase, longest zero-run ``::`` compression (README.md:192-215 vectors:
192.168.1.1 ↔ 3232235777 ↔ "101:a8c0::") — implemented as an Arrow-batched
pandas UDF over Python ``ipaddress`` (exact RFC 5952).
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType


def ipv4_from_flow_addr(addr: Column) -> Column:
    """Big-endian u32 from the first 4 bytes of a 16-byte flow address.

    ≡ ClickHouse ``reinterpretAsUInt32(substring(reverse(addr), 13, 4))``
    (viz-ch.json:233). Pure JVM expression — codegen-friendly.
    """
    return F.conv(F.hex(F.substring(addr, 1, 4)), 16, 10).cast("long")


def ipv4_num_to_string(num: Column) -> Column:
    """Dotted-quad render of a u32. ≡ ClickHouse ``IPv4NumToString``."""
    n = num.cast("long")
    return F.concat_ws(
        ".",
        ((n / 16777216).cast("long") % 256).cast("string"),
        ((n / 65536).cast("long") % 256).cast("string"),
        ((n / 256).cast("long") % 256).cast("string"),
        (n % 256).cast("string"),
    )


def ipv4_string_to_num(s: Column) -> Column:
    """Inverse of :func:`ipv4_num_to_string`. ≡ CH ``IPv4StringToNum``."""
    parts = F.split(s, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


@pandas_udf(StringType())
def _ipv6_render(addr: pd.Series) -> pd.Series:
    def render(b):
        if b is None or len(b) == 0:
            return None
        b = bytes(b)
        if len(b) != 16:
            b = b.ljust(16, b"\x00")[:16]
        return str(ipaddress.IPv6Address(b))
    return addr.map(render)


def ipv6_num_to_string(addr: Column) -> Column:
    """RFC-5952 render of a 16-byte address. ≡ CH ``IPv6NumToString``
    (longest zero-run compressed, lowercase — README.md:192-202:
    bytes(01 01 a8 c0 | 0*12) → "101:a8c0::")."""
    return _ipv6_render(addr)


@pandas_udf(BinaryType())
def _ipv6_parse(s: pd.Series) -> pd.Series:
    def parse(v):
        if v is None:
            return None
        return ipaddress.IPv6Address(v).packed
    return s.map(parse)


def ipv6_string_to_num(s: Column) -> Column:
    """≡ CH ``IPv6StringToNum``: textual IPv6 → 16 bytes."""
    return _ipv6_parse(s)


def reinterpret_u32_as_bytes16(num: Column) -> Column:
    """≡ CH ``toFixedString(reinterpretAsString(u32), 16)``: the u32's
    little-endian bytes, zero-padded to 16 (README.md:192-202 demo layout)."""
    n = num.cast("long")
    return F.concat(
        _byte(n % 256), _byte((n / 256).cast("long") % 256),
        _byte((n / 65536).cast("long") % 256),
        _byte((n / 16777216).cast("long") % 256),
        F.lit(b"\x00" * 12),
    )


def _byte(v: Column) -> Column:
    return F.unhex(F.lpad(F.hex(v.cast("long")), 2, "0"))


def u32_to_v4mapped_bytes16(num: Column) -> Column:
    """IPv4-mapped IPv6 bytes (::ffff:a.b.c.d) from a u32, big-endian v4
    tail — the layout Go's ``net.IP.To4()`` recognizes and renders as a
    dotted quad (inserter/inserter.go:131-140 path for 16-byte v4-mapped
    addresses)."""
    n = num.cast("long")
    return F.concat(
        F.lit(b"\x00" * 10 + b"\xff\xff"),
        _byte((n / 16777216).cast("long") % 256),
        _byte((n / 65536).cast("long") % 256),
        _byte((n / 256).cast("long") % 256),
        _byte(n % 256),
    )


def flow_addr_to_string(addr: Column, etype: Column) -> Column:
    """The dashboard's dual render (viz-ch.json:233,479; README.md:219-221):
    ``if(EType = 0x800, IPv4NumToString(<first-4-bytes-BE>),
    IPv6NumToString(addr))``."""
    return F.when(
        etype == 0x800, ipv4_num_to_string(ipv4_from_flow_addr(addr))
    ).otherwise(ipv6_num_to_string(addr))


@pandas_udf(StringType())
def _go_ip_render(addr: pd.Series) -> pd.Series:
    """Go ``net.IP.String()`` semantics (inserter/inserter.go:131-140):
    nil/empty → "0.0.0.0" substituted by the inserter; 4-byte → dotted quad;
    16-byte IPv4-mapped (::ffff:a.b.c.d) → dotted quad (Go To4()); other
    16-byte → RFC-5952 IPv6."""
    def render(b):
        if b is None or len(b) == 0:
            return "0.0.0.0"
        b = bytes(b)
        if len(b) == 4:
            return ".".join(str(x) for x in b)
        if len(b) == 16:
            if b[:10] == b"\x00" * 10 and b[10] == 0xFF and b[11] == 0xFF:
                return ".".join(str(x) for x in b[12:])
            return str(ipaddress.IPv6Address(b))
        return "0.0.0.0"  # Go: "?" for invalid lengths; inserter guards nil
    return addr.map(render)


def go_ip_to_string(addr: Column) -> Column:
    return _go_ip_render(addr)


def register_sql_functions(spark) -> None:
    """Expose the IP library to Spark SQL (SURVEY §2.7): the dashboards'
    `IPv4NumToString(...)` idioms become callable from `spark.sql(...)`.

    Column-expression functions (the codegen-friendly hot path) cannot be
    registered by name, so SQL gets thin UDF wrappers with identical
    semantics; DataFrame callers should keep using the expression forms.
    """
    import ipaddress as _ip

    def _v4_num_to_string(n):
        return None if n is None else str(_ip.IPv4Address(int(n) & 0xFFFFFFFF))

    def _v4_string_to_num(s):
        return None if s is None else int(_ip.IPv4Address(s))

    def _v6_num_to_string(b):
        if b is None or len(b) == 0:
            return None
        b = bytes(b).ljust(16, b"\x00")[:16]
        return str(_ip.IPv6Address(b))

    def _v6_string_to_num(s):
        return None if s is None else _ip.IPv6Address(s).packed

    def _flow_addr_to_string(b, etype):
        if b is None or len(b) == 0:
            return None
        b = bytes(b).ljust(16, b"\x00")[:16]
        if etype == 0x800:
            return str(_ip.IPv4Address(b[:4]))
        return str(_ip.IPv6Address(b))

    from pyspark.sql.types import BinaryType as _B
    from pyspark.sql.types import LongType as _L
    from pyspark.sql.types import StringType as _S

    def _go_ip_to_string(b):
        if b is None or len(b) == 0:
            return "0.0.0.0"
        b = bytes(b)
        if len(b) == 4:
            return ".".join(str(x) for x in b)
        if len(b) == 16:
            if b[:10] == b"\x00" * 10 and b[10] == 0xFF and b[11] == 0xFF:
                return ".".join(str(x) for x in b[12:])
            return str(_ip.IPv6Address(b))
        return "0.0.0.0"

    spark.udf.register("ipv4_num_to_string", _v4_num_to_string, _S())
    spark.udf.register("ipv4_string_to_num", _v4_string_to_num, _L())
    spark.udf.register("ipv6_num_to_string", _v6_num_to_string, _S())
    spark.udf.register("ipv6_string_to_num", _v6_string_to_num, _B())
    spark.udf.register("flow_addr_to_string", _flow_addr_to_string, _S())
    spark.udf.register("go_ip_to_string", _go_ip_to_string, _S())
