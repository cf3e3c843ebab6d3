"""Property-based tests (hypothesis): the invariants the fixed vectors
can't exhaust — arbitrary field values through the protobuf wire codec,
arbitrary addresses through the IP render/parse library.

These run driver-side against the same pure functions the Arrow UDFs call
per batch, so every property proven here holds inside the Spark plan.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flow_pipeline_spark.sources.protobuf import (
    FLOW_FIELDS,
    decode_flow_batch,
    decode_flow_batch_vectorized,
    decode_flow_message,
    encode_flow_batch_vectorized,
    encode_flow_batch,
    encode_flow_message,
    frame_length_delimited,
    unframe_length_delimited,
)

_VARINT_FIELDS = [n for _, (n, k) in sorted(FLOW_FIELDS.items())
                  if k == "varint"]
_BYTES_FIELDS = [n for _, (n, k) in sorted(FLOW_FIELDS.items())
                 if k == "bytes"]

_LONG = {"TimeReceived", "SamplingRate", "TimeFlowStart", "TimeFlowEnd",
         "Bytes", "Packets"}


def _record_strategy():
    # u64 domain for long fields, u31 for int fields (DECODED_SCHEMA uses
    # IntegerType for u32-ish proto fields; generator stays in-range)
    parts = {}
    for n in _VARINT_FIELDS:
        hi = 2**63 - 1 if n in _LONG else 2**31 - 1
        parts[n] = st.integers(min_value=0, max_value=hi)
    for n in _BYTES_FIELDS:
        parts[n] = st.binary(min_size=0, max_size=16)
    return st.fixed_dictionaries(parts)


@given(_record_strategy())
@settings(max_examples=300, deadline=None)
def test_wire_roundtrip_single(rec):
    """decode(encode(r)) == r up to proto3 default elision (0 / b'')."""
    out = decode_flow_message(encode_flow_message(rec))
    for n in _VARINT_FIELDS:
        assert out.get(n, 0) == rec[n]
    for n in _BYTES_FIELDS:
        assert bytes(out.get(n, b"")) == rec[n]


@given(st.lists(_record_strategy(), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_wire_roundtrip_batch(recs):
    """The column-oriented batch codec agrees with the row codec and with
    the input, framing included — what the Arrow UDFs execute."""
    pdf = pd.DataFrame(recs)
    msgs = encode_flow_batch(pdf, fixed_length=True)
    # the column-vectorized encoder (the Arrow-UDF hot path) is identical
    assert encode_flow_batch_vectorized(pdf, fixed_length=True) == msgs
    assert encode_flow_batch_vectorized(pdf) == encode_flow_batch(pdf)
    # batch encode ≡ row encode + framing
    for msg, rec in zip(msgs, recs):
        assert msg == frame_length_delimited(encode_flow_message(rec))
        assert unframe_length_delimited(msg) == encode_flow_message(rec)
    out = decode_flow_batch(msgs, fixed_length=True)
    for n in _VARINT_FIELDS:
        assert out[n].tolist() == [r[n] for r in recs], n
    for n in _BYTES_FIELDS:
        assert [bytes(b) for b in out[n]] == [r[n] for r in recs], n
    # the lockstep-vectorized decoder (the Arrow-UDF hot path) must agree
    # bit-for-bit with the scalar reference on every generated batch
    vec = decode_flow_batch_vectorized(msgs, fixed_length=True)
    for n in _VARINT_FIELDS:
        assert vec[n].tolist() == out[n].tolist(), n
    for n in _BYTES_FIELDS:
        assert [bytes(b) for b in vec[n]] == [bytes(b) for b in out[n]], n


@given(st.binary(min_size=16, max_size=16))
@settings(max_examples=300, deadline=None)
def test_ipv6_render_matches_rfc5952(b):
    """Our v6 render (the pandas-UDF kernel) ≡ Python ipaddress (RFC 5952)
    for every possible 16-byte value."""
    from flow_pipeline_spark.functions.ip import _ipv6_render
    got = _ipv6_render.func(pd.Series([b])).iloc[0]
    assert got == str(ipaddress.IPv6Address(b))


def test_ipv4_num_string_roundtrip_sweep(spark):
    """ipv4_num_to_string / ipv4_string_to_num are exact inverses (JVM
    expression forms, one Spark job): 5000 hash-spread u32s + the byte-edge
    values, each also cross-checked against Python ipaddress."""
    from pyspark.sql import functions as F

    from flow_pipeline_spark.functions.ip import (
        ipv4_num_to_string,
        ipv4_string_to_num,
    )
    edges = [0, 1, 255, 256, 65535, 65536, 16777215, 16777216,
             2**31 - 1, 2**31, 2**32 - 2, 2**32 - 1]
    hashed = (F.pmod(F.xxhash64("id"), F.lit(2**32))).cast("long")
    df = (spark.range(5000).select(hashed.alias("n"))
          .union(spark.createDataFrame([(e,) for e in edges], "n LONG")))
    rows = (df.select("n", ipv4_num_to_string(F.col("n")).alias("s"))
            .select("n", "s", ipv4_string_to_num(F.col("s")).alias("back"))
            .collect())
    assert len(rows) == 5012
    for r in rows:
        assert r["back"] == r["n"], r
        assert r["s"] == str(ipaddress.IPv4Address(r["n"])), r


def test_vectorized_decoder_falls_back_on_exotic_wire_types():
    """Messages with wire types the lockstep path doesn't vectorize
    (fixed32/fixed64) are routed to the scalar decoder — results match."""
    # field 9 (Bytes) as fixed64 (wire 1), field 21 (SrcPort) as fixed32
    # (wire 5), plus a normal varint field
    # tags are varints: field 21 wire 5 → tag 173 → b"\xad\x01";
    # field 14 wire 0 → tag 112 (1 byte); field 9 wire 1 → tag 73 (1 byte)
    exotic = (bytes([(9 << 3) | 1]) + (1234567).to_bytes(8, "little")
              + b"\xad\x01" + (443).to_bytes(4, "little")
              + bytes([(14 << 3) | 0, 0x88, 0xFC, 0x03]))  # SrcAS = 65032
    normal = encode_flow_message({"Bytes": 10, "SrcAS": 65001,
                                  "SrcAddr": bytes(range(16))})
    msgs = [exotic, normal, exotic]
    a = decode_flow_batch(msgs)
    b = decode_flow_batch_vectorized(msgs)
    for c in a.columns:
        if a[c].dtype == object:
            assert [bytes(x) for x in a[c]] == [bytes(x) for x in b[c]], c
        else:
            assert a[c].tolist() == b[c].tolist(), c
    assert b["Bytes"].tolist() == [1234567, 10, 1234567]
    assert b["SrcPort"].tolist() == [443, 0, 443]
    assert b["SrcAS"].tolist() == [65032, 65001, 65032]


def test_codec_wire_robustness_round7():
    """Round-7 review fixes, each pinned: negative varints encode as
    64-bit two's complement instead of infinite-looping; None (Kafka
    tombstone) decodes as a defaults row; u32 >= 2^31 survives the
    int32 reinterpretation with EXACT wire parity on re-encode;
    truncated messages raise in BOTH decoders (the vectorized one used
    to read the neighboring message's bytes); NaN encodes as default;
    uint64 >= 2^63 decodes via signed reinterpretation and round-trips;
    wire-type/declared-kind mismatches skip like unknown fields in the
    scalar paths (vectorized parity); varints are capped at the spec's
    10 bytes."""
    import pandas as pd
    import pytest

    from flow_pipeline_spark.sources import protobuf as P

    out = bytearray()
    P._write_varint(out, -1)
    assert len(out) == 10                 # two's complement, no hang

    for fn in (P.decode_flow_batch, P.decode_flow_batch_vectorized):
        df = fn([None, P.encode_flow_message({"Type": 3})])
        assert df["Type"].tolist() == [0, 3], fn.__name__

    msg = P.encode_flow_message({"SrcAS": 4_200_000_000})
    d = P.decode_flow_batch([msg])
    assert d["SrcAS"].iloc[0] == 4_200_000_000 - 2**32
    assert P.encode_flow_batch(d)[0] == msg          # exact wire parity

    valid = P.encode_flow_message({"Type": 3})
    for fn in (P.decode_flow_batch, P.decode_flow_batch_vectorized):
        with pytest.raises(IndexError):
            fn([b"\x08", valid])          # tag with truncated varint
    tp = bytes.fromhex("32") + bytes([10]) + b"abc"  # short wire-2 payload
    a = P.decode_flow_batch([tp, valid])
    b = P.decode_flow_batch_vectorized([tp, valid])
    assert a["SrcAddr"].tolist() == b["SrcAddr"].tolist()

    enc = P.encode_flow_batch(pd.DataFrame(
        {"Type": [float("nan"), 3.0], "SrcAddr": [b"", b"x"]}))
    assert P.decode_flow_batch(enc)["Type"].tolist() == [0, 3]

    big = 2**63 + 5
    m = P.encode_flow_message({"Bytes": big})
    d = P.decode_flow_batch([m])
    assert d["Bytes"].iloc[0] == big - 2**64
    assert P.encode_flow_batch(d)[0] == m

    mis = bytes.fromhex("a201") + bytes([2]) + b"ab"  # Proto field, wire 2
    assert "Proto" not in P.decode_flow_message(mis)
    assert P.decode_flow_batch([mis])["Proto"].iloc[0] == 0
    mis0 = bytes.fromhex("30") + bytes([5])           # SrcAddr field, wire 0
    assert "SrcAddr" not in P.decode_flow_message(mis0)
    assert P.decode_flow_batch([mis0])["SrcAddr"].iloc[0] == b""

    with pytest.raises(ValueError):
        P._read_varint(b"\x80" * 10 + b"\x01", 0)     # 11 bytes: reject
    assert P._read_varint(b"\x80" * 9 + b"\x01", 0)[0] == 1 << 63

    # round-7 second pass: the 10-byte bound holds in the BATCH decoders
    # too — the inlined loops used to silently mask an 11-byte varint
    # the scalar dict API rejects, so the APIs disagreed on the same
    # malformed bytes
    overlong = b"\x08" + b"\x80" * 10 + b"\x01"   # field 1, 11-byte varint
    with pytest.raises(ValueError):
        P.decode_flow_message(overlong)
    for fn in (P.decode_flow_batch, P.decode_flow_batch_vectorized):
        with pytest.raises(ValueError):
            fn([overlong, valid])
    # ...while the LEGAL 10-byte maximum (uint64 >= 2^63 needs all 10)
    # is accepted by every path, vectorized included (it routes >9-byte
    # varints through the scalar fallback)
    dv = P.decode_flow_batch_vectorized([m])
    assert dv["Bytes"].iloc[0] == big - 2**64

    # framed-length overrun: a prefix overstating the actual bytes is
    # malformed in BOTH decoders — the vectorized path used to silently
    # decode the truncated view where the scalar one died mid-parse
    framed_ok = bytes([len(valid)]) + valid
    framed_over = bytes([len(valid) + 5]) + valid
    for fn in (P.decode_flow_batch, P.decode_flow_batch_vectorized):
        assert fn([framed_ok], fixed_length=True)["Type"].tolist() == [3]
        with pytest.raises(ValueError, match="overruns"):
            fn([framed_over], fixed_length=True)

    # vectorized encode applies the u32 field-width mask like the
    # scalar path: a LongType 2^45 on a 4-byte field masks to 0 (field
    # omitted), 2^32+7 masks to 7 — byte parity, not a 64-bit varint
    pdf32 = pd.DataFrame({"SrcAS": [2**45, 2**32 + 7]})
    assert (P.encode_flow_batch_vectorized(pdf32)
            == P.encode_flow_batch(pdf32))
