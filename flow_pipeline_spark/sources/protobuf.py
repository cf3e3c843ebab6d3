"""FlowMessage protobuf wire codec + Spark column functions.

The reference moves flow records as protobuf (pb-ext/flow.proto:7-65):
ClickHouse decodes with ``kafka_format='Protobuf', kafka_schema=
'flow.proto:FlowMessage'`` (compose/clickhouse/create.sh:33-34); the Go
inserter uses ``proto.Unmarshal`` (inserter/inserter.go:122-128); the mocker
encodes with ``proto.Marshal`` or length-delimited ``buf.EncodeMessage``
behind ``-proto.fixedlen`` (mocker/mocker.go:96-102; framing required by
ClickHouse per README.md:104).

Preferred Spark path is ``from_protobuf``/``to_protobuf`` (pyspark.sql.
protobuf) with a compiled descriptor set — but that needs the external
spark-protobuf jar. Since FlowMessage uses only varint and bytes wire types,
we also ship a self-contained codec implementing the public protobuf wire
format (varint tags: ``(field_number << 3) | wire_type``; wire 0 = varint,
wire 2 = length-delimited), exposed as Arrow pandas UDFs. This keeps the
Kafka⇄protobuf edge testable with zero external deps. On a cluster carrying
the spark-protobuf jar + a protoc-compiled descriptor set,
``pyspark.sql.protobuf.functions.from_protobuf`` is a drop-in replacement
for :func:`from_flow_protobuf` — both parse the same public wire format, so
outputs are bit-identical (property-tested round-trip in
tests/test_codec_properties.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# field number -> (name, kind); kind: 'varint' | 'bytes'
# exactly pb-ext/flow.proto:16-64
FLOW_FIELDS: dict[int, tuple[str, str]] = {
    1: ("Type", "varint"),
    2: ("TimeReceived", "varint"),
    4: ("SequenceNum", "varint"),
    3: ("SamplingRate", "varint"),
    42: ("FlowDirection", "varint"),
    11: ("SamplerAddress", "bytes"),
    38: ("TimeFlowStart", "varint"),
    5: ("TimeFlowEnd", "varint"),
    9: ("Bytes", "varint"),
    10: ("Packets", "varint"),
    6: ("SrcAddr", "bytes"),
    7: ("DstAddr", "bytes"),
    30: ("Etype", "varint"),
    20: ("Proto", "varint"),
    21: ("SrcPort", "varint"),
    22: ("DstPort", "varint"),
    18: ("InIf", "varint"),
    19: ("OutIf", "varint"),
    23: ("IPTos", "varint"),
    24: ("ForwardingStatus", "varint"),
    25: ("IPTTL", "varint"),
    26: ("TCPFlags", "varint"),
    31: ("IcmpType", "varint"),
    32: ("IcmpCode", "varint"),
    37: ("IPv6FlowLabel", "varint"),
    14: ("SrcAS", "varint"),
    15: ("DstAS", "varint"),
}
_NAME_TO_NUM = {name: num for num, (name, _) in FLOW_FIELDS.items()}

# 64-bit fields keep LongType; the rest (u32/enums) IntegerType
_LONG_FIELDS = {"TimeReceived", "SamplingRate", "TimeFlowStart", "TimeFlowEnd",
                "Bytes", "Packets"}

DECODED_SCHEMA = T.StructType([
    T.StructField(name,
                  T.BinaryType() if kind == "bytes"
                  else (T.LongType() if name in _LONG_FIELDS
                        else T.IntegerType()),
                  True)
    for _, (name, kind) in sorted(FLOW_FIELDS.items(),
                                  key=lambda kv: kv[1][0])
])


# --- wire-level primitives (public protobuf encoding) ----------------------

def _write_varint(out: bytearray, v: int) -> None:
    # negatives encode as 64-bit two's complement (proto.Marshal's form
    # for negative int32/int64) — without the mask, Python's arithmetic
    # shift keeps -1 >> 7 == -1 and the loop appends 0xFF forever
    # (round-7 review: an executor-hanging infinite loop)
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            # spec maximum is 10 bytes (the 10th byte sits at shift 63);
            # the old `> 70` bound accepted 11-byte varints that
            # conformant parsers (Go, ClickHouse) reject (round-7 review)
            raise ValueError("varint too long")


# u32/enum columns store as SIGNED int32 (DECODED_SCHEMA; the standard
# Spark/Java unsigned-as-signed reinterpretation): a 4-byte ASN >= 2^31
# (RFC 6996 private range) round-trips EXACTLY because the encoders mask
# each varint back to its field width below — but it DISPLAYS negative
# in Spark. _varint_mask is that width: 32-bit for int columns, 64-bit
# for _LONG_FIELDS (round-7 review: the unmasked encode of a wrapped
# negative fed the infinite-loop path; now it regenerates the exact
# bytes proto.Marshal produced for the original unsigned value).
def _varint_mask(name: str) -> int:
    return (0xFFFFFFFFFFFFFFFF if name in _LONG_FIELDS
            else 0xFFFFFFFF)


def _signed64(v: int) -> int:
    """Wire varint value → the int64 cell the batch decoders store:
    values >= 2^63 (legal uint64 on the wire) reinterpret as negative
    two's complement instead of raising OverflowError at the numpy
    assignment (round-7 review); the encoder's 64-bit mask inverts this
    exactly."""
    v &= 0xFFFFFFFFFFFFFFFF
    return v - 0x10000000000000000 if v >= 0x8000000000000000 else v


def encode_flow_message(rec: dict) -> bytes:
    """proto3 serialization of one FlowMessage dict (defaults omitted, as
    proto3 does — parity with proto.Marshal at mocker.go:97)."""
    out = bytearray()
    for num in sorted(FLOW_FIELDS):
        name, kind = FLOW_FIELDS[num]
        v = rec.get(name)
        if v is None or v != v:     # None or NaN (Arrow nullable-int form)
            continue
        if kind == "varint":
            v = int(v) & _varint_mask(name)
            if v == 0:
                continue
            _write_varint(out, (num << 3) | 0)
            _write_varint(out, v)
        else:
            v = bytes(v)
            if not v:
                continue
            _write_varint(out, (num << 3) | 2)
            _write_varint(out, len(v))
            out += v
    return bytes(out)


def decode_flow_message(buf: bytes) -> dict:
    """Wire-format parse; unknown fields skipped (proto3 semantics)."""
    rec: dict = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 0x07
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            v = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        elif wire == 1:
            v = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if num in FLOW_FIELDS:
            name, kind = FLOW_FIELDS[num]
            # wire type must match the declared kind (round-7 review: a
            # wire-2 payload on a varint field, or a varint on a bytes
            # field, stored a mistyped value; mismatches now skip like
            # any unknown field — the vectorized path's behavior)
            if (wire == 2) == (kind == "bytes"):
                rec[name] = v
    return rec


def frame_length_delimited(msg: bytes) -> bytes:
    """varint-length prefix (mocker.go ``buf.EncodeMessage`` under
    -proto.fixedlen; ClickHouse expects this framing, README.md:104)."""
    out = bytearray()
    _write_varint(out, len(msg))
    return bytes(out) + msg


def unframe_length_delimited(buf: bytes) -> bytes:
    ln, pos = _read_varint(buf, 0)
    return buf[pos:pos + ln]


# --- descriptor set for native from_protobuf/to_protobuf --------------------
# Spark's native protobuf functions (spark-protobuf jar, SURVEY S3/S4's
# preferred mapping) take a protoc-compiled FileDescriptorSet. protoc is not
# in this container — but descriptor.proto's wire format is public protobuf
# like any other, so the descriptor set for flow.proto is hand-encoded here
# with the same varint/length-delimited primitives as the row codec. The
# moment the spark-protobuf jar is on the classpath,
# ``pyspark.sql.protobuf.functions.from_protobuf(col, "flowprotob.
# FlowMessage", binaryDescriptorSet=flow_descriptor_set())`` runs with no
# extra toolchain (parity test: tests/test_kafka_edge.py).

# FieldDescriptorProto.Type values (descriptor.proto, public)
_T_UINT64, _T_BYTES, _T_UINT32, _T_ENUM = 4, 12, 13, 14
# per-field protobuf declared type, exactly pb-ext/flow.proto:16-64
_PROTO_TYPES: dict[int, int] = {
    **{num: _T_UINT32 for num in FLOW_FIELDS},
    1: _T_ENUM,                                   # FlowType Type = 1
    2: _T_UINT64, 3: _T_UINT64, 38: _T_UINT64,    # times / sampling
    5: _T_UINT64, 9: _T_UINT64, 10: _T_UINT64,    # uint64 counters
    11: _T_BYTES, 6: _T_BYTES, 7: _T_BYTES,       # addresses
}


def _tag(out: bytearray, field_num: int, wire: int) -> None:
    _write_varint(out, (field_num << 3) | wire)


def _ld(out: bytearray, field_num: int, payload: bytes) -> None:
    """length-delimited submessage/string field (wire type 2)."""
    _tag(out, field_num, 2)
    _write_varint(out, len(payload))
    out.extend(payload)


def _vi(out: bytearray, field_num: int, v: int) -> None:
    _tag(out, field_num, 0)
    _write_varint(out, v)


def flow_descriptor_set() -> bytes:
    """FileDescriptorSet bytes for flow.proto (message flowprotob.
    FlowMessage + nested enum FlowType) — what ``protoc
    --descriptor_set_out`` would emit, minus source-info.

    Descriptor field numbers used (all from the public descriptor.proto):
    FileDescriptorSet.file=1; FileDescriptorProto .name=1 .package=2
    .message_type=4 .syntax=12; DescriptorProto .name=1 .field=2
    .enum_type=4; FieldDescriptorProto .name=1 .number=3 .label=4 .type=5
    .type_name=6; EnumDescriptorProto .name=1 .value=2;
    EnumValueDescriptorProto .name=1 .number=2.
    """
    # nested enum FlowType (flow.proto:9-15)
    enum_pb = bytearray()
    _ld(enum_pb, 1, b"FlowType")
    for ename, enum_val in [(b"FLOWUNKNOWN", 0), (b"SFLOW_5", 1),
                            (b"NETFLOW_V5", 2), (b"NETFLOW_V9", 3),
                            (b"IPFIX", 4)]:
        ev = bytearray()
        _ld(ev, 1, ename)
        _vi(ev, 2, enum_val)
        _ld(enum_pb, 2, bytes(ev))

    msg_pb = bytearray()
    _ld(msg_pb, 1, b"FlowMessage")
    for num in sorted(FLOW_FIELDS):
        name, _ = FLOW_FIELDS[num]
        f = bytearray()
        _ld(f, 1, name.encode())
        _vi(f, 3, num)
        _vi(f, 4, 1)                    # LABEL_OPTIONAL (proto3 singular)
        _vi(f, 5, _PROTO_TYPES[num])
        if _PROTO_TYPES[num] == _T_ENUM:
            _ld(f, 6, b".flowprotob.FlowMessage.FlowType")
        _ld(msg_pb, 2, bytes(f))
    _ld(msg_pb, 4, bytes(enum_pb))

    file_pb = bytearray()
    _ld(file_pb, 1, b"flow.proto")
    _ld(file_pb, 2, b"flowprotob")
    _ld(file_pb, 4, bytes(msg_pb))
    _ld(file_pb, 12, b"proto3")

    out = bytearray()
    _ld(out, 1, bytes(file_pb))
    return bytes(out)


# --- batch codecs (column-oriented; the Arrow-UDF hot path) -----------------

_SORTED_FIELDS = sorted(FLOW_FIELDS.items())  # [(num, (name, kind)), ...]
_VEC_LUTS = None


def _vec_luts():
    """Module-level (lazily built) numpy lookup tables for the
    vectorized decoder: field number → slot / kind (1 varint, 2 bytes).
    Previously rebuilt per Arrow batch on the streaming hot path
    (round-7 review); numpy stays a function-local import elsewhere, so
    the build is deferred to first decode rather than module import."""
    global _VEC_LUTS
    if _VEC_LUTS is None:
        import numpy as np
        slot_lut = np.full(_MAX_NUM, -1, dtype=np.int64)
        kind_lut = np.zeros(_MAX_NUM, dtype=np.int64)
        for num, (name, kind) in FLOW_FIELDS.items():
            slot_lut[num] = _NUM_TO_SLOT[num]
            kind_lut[num] = 1 if kind == "varint" else 2
        _VEC_LUTS = (slot_lut, kind_lut)
    return _VEC_LUTS
_MAX_NUM = max(FLOW_FIELDS) + 1
# field number -> output-column slot, -1 = unknown field (skip)
_NUM_TO_SLOT = [-1] * _MAX_NUM
_SLOT_NAMES = [f.name for f in DECODED_SCHEMA.fields]
_SLOT_KIND = []
for _slot, _name in enumerate(_SLOT_NAMES):
    _NUM_TO_SLOT[_NAME_TO_NUM[_name]] = _slot
    _SLOT_KIND.append(FLOW_FIELDS[_NAME_TO_NUM[_name]][1])


def encode_flow_batch(pdf: pd.DataFrame, *, fixed_length: bool = False) -> list:
    """Encode a pandas batch of flow columns → list[bytes].

    Column-oriented: each column is pulled out once as a Python list and the
    per-row loop only does varint writes — ~30× the throughput of a per-row
    ``Series.apply`` + dict round-trip.
    """
    n = len(pdf)
    cols = []
    for num, (name, kind) in _SORTED_FIELDS:
        if name not in pdf.columns:
            continue
        vals = pdf[name].tolist()  # numpy scalars -> plain Python ints
        cols.append((num, kind, vals, _varint_mask(name)))
    out = []
    for i in range(n):
        buf = bytearray()
        for num, kind, vals, mask in cols:
            v = vals[i]
            if v is None or v != v:  # None or NaN — Arrow renders a
                continue             # nullable int column as float64+NaN
            if kind == "varint":
                v = int(v) & mask
                if v == 0:
                    continue
                _write_varint(buf, (num << 3) | 0)
                _write_varint(buf, v)
            else:
                v = bytes(v)
                if not v:
                    continue
                _write_varint(buf, (num << 3) | 2)
                _write_varint(buf, len(v))
                buf += v
        msg = bytes(buf)
        if fixed_length:
            msg = frame_length_delimited(msg)
        out.append(msg)
    return out


def decode_flow_batch(bufs, *, fixed_length: bool = False) -> pd.DataFrame:
    """Decode an iterable of wire messages → columnar pandas batch.

    Fills pre-allocated per-column arrays (proto3 defaults 0 / b"") with an
    inlined varint loop — no per-row dict, no per-row list comprehension.
    """
    import numpy as np

    # None (a Kafka tombstone / null value column) decodes like the
    # empty message — a full proto3-defaults row — instead of raising
    # TypeError and killing the streaming query (round-7 review)
    msgs = [b"" if b is None else bytes(b) for b in bufs]
    n = len(msgs)
    arrays = []
    for kind in _SLOT_KIND:
        if kind == "bytes":
            a = np.empty(n, dtype=object)
            a.fill(b"")
        else:
            a = np.zeros(n, dtype="int64")
        arrays.append(a)
    num_to_slot = _NUM_TO_SLOT
    slot_kind = _SLOT_KIND
    max_num = _MAX_NUM
    for i in range(n):
        buf = msgs[i]
        if not buf:
            continue            # empty/None message → all-defaults row
        pos = 0
        ln = len(buf)
        if fixed_length:
            # inline varint length prefix
            mlen = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                mlen |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 63:      # same 10-byte spec bound as _read_varint
                    raise ValueError("varint too long")
            ln = pos + mlen
            if ln > len(buf):
                # a prefix overstating the actual bytes is malformed —
                # raise the codec's deliberate error instead of a raw
                # IndexError mid-parse, and keep parity with the
                # vectorized path (round-7 review: that path silently
                # decoded the truncated view)
                raise ValueError("framed length overruns buffer")
        while pos < ln:
            # inline varint tag
            tag = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                tag |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 63:
                    raise ValueError("varint too long")
            num = tag >> 3
            wire = tag & 0x07
            if wire == 0:
                v = 0
                shift = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    v |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 63:
                        # keep the two batch APIs and the scalar dict API
                        # agreeing on malformed wire data: an 11+-byte
                        # varint is a spec violation conformant parsers
                        # reject, not a value to mask (round-7 review —
                        # only _read_varint had the bound before)
                        raise ValueError("varint too long")
            elif wire == 2:
                blen = 0
                shift = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    blen |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 63:
                        raise ValueError("varint too long")
                v = buf[pos:pos + blen]
                pos += blen
            elif wire == 5:
                v = int.from_bytes(buf[pos:pos + 4], "little")
                pos += 4
            elif wire == 1:
                v = int.from_bytes(buf[pos:pos + 8], "little")
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
            if num < max_num:
                slot = num_to_slot[num]
                # store only when the wire type matches the declared
                # kind (round-7 review: a wire-2 blob raised ValueError
                # assigning into the int64 array; a varint into a bytes
                # column broke Arrow serialization downstream)
                if slot >= 0 and (wire == 2) == (slot_kind[slot] == "bytes"):
                    if wire == 2:
                        arrays[slot][i] = v
                    else:
                        arrays[slot][i] = _signed64(v)
    data = {}
    for slot, name in enumerate(_SLOT_NAMES):
        a = arrays[slot]
        if _SLOT_KIND[slot] != "bytes":
            # narrow u32/enums back to int32 to match DECODED_SCHEMA —
            # an unsigned value >= 2^31 (4-byte ASN) REINTERPRETS as
            # negative (the Spark/Java unsigned-as-signed convention,
            # documented at _varint_mask); the encoders' field-width
            # mask makes the round trip exact
            if name not in _LONG_FIELDS:
                a = a.astype("int32")
        data[name] = a
    return pd.DataFrame(data)


def encode_flow_batch_vectorized(pdf: pd.DataFrame, *,
                                 fixed_length: bool = False) -> list:
    """Column-vectorized wire encode: the numpy twin of
    :func:`decode_flow_batch_vectorized`.

    Per field: presence mask, varint byte matrix ((v >> 7k) & 0x7f with
    continuation bits), and per-row field width — all vectorized; one
    running per-row offset threads the fields together, and each field
    writes its tag/varint/payload bytes with ≤ a dozen masked scatters.
    The only O(rows) Python work is the final buffer→list-of-bytes split
    (and a b"".join over payload columns). Batches outside the common
    shape (negative values, payloads ≥ 128 bytes) fall back to the scalar
    encoder; equivalence is property-tested."""
    import numpy as np

    n = len(pdf)
    if n == 0:
        return []
    cols = {}
    for num, (name, kind) in _SORTED_FIELDS:
        if name not in pdf.columns:
            continue
        if kind == "varint":
            v = pdf[name].to_numpy()
            v = np.where(pd.isna(v), 0, v).astype(np.int64)
            if (v < 0).any():
                return encode_flow_batch(pdf, fixed_length=fixed_length)
            if name not in _LONG_FIELDS:
                # field-width mask, like encode_flow_message's
                # _varint_mask: a 4-byte field's value encodes modulo
                # 2^32 (round-7 review — this path emitted full 64-bit
                # varints for u32 fields when handed a LongType column,
                # diverging byte-wise from the scalar encoder and from
                # proto.Marshal). 64-bit fields need no mask here:
                # negatives already fell back to the scalar path.
                v = v & np.int64(0xFFFFFFFF)
            cols[num] = ("varint", v)
        else:
            payloads = [b"" if p is None else bytes(p) for p in pdf[name]]
            lens = np.fromiter(map(len, payloads), dtype=np.int64, count=n)
            if (lens >= 128).any():
                return encode_flow_batch(pdf, fixed_length=fixed_length)
            cols[num] = ("bytes", (payloads, lens))

    def tag_bytes(num: int, wire: int) -> bytes:
        out = bytearray()
        _write_varint(out, (num << 3) | wire)
        return bytes(out)

    # pass 1: per-field widths and varint byte matrices
    plans = []   # (tag, present, width, payload-spec)
    widths = np.zeros(n, dtype=np.int64)
    for num in sorted(cols):
        kind, data = cols[num]
        if kind == "varint":
            v = data
            present = v != 0
            nb = np.ones(n, dtype=np.int64)
            for k in range(1, 10):
                nb[v >= (1 << (7 * k))] = k + 1
            bm = np.zeros((n, 10), dtype=np.uint8)
            for k in range(10):
                chunk = (v >> (7 * k)) & 0x7F
                bm[:, k] = np.where(k + 1 < nb, chunk | 0x80, chunk)
            tb = tag_bytes(num, 0)
            w = present * (len(tb) + nb)
            plans.append((tb, present, ("varint", nb, bm)))
        else:
            payloads, lens = data
            present = lens > 0
            tb = tag_bytes(num, 2)
            w = present * (len(tb) + 1 + lens)
            plans.append((tb, present, ("bytes", payloads, lens)))
        widths += w

    if fixed_length:
        plen = np.ones(n, dtype=np.int64)
        for k in range(1, 10):
            plen[widths >= (1 << (7 * k))] = k + 1
        total_w = widths + plen
    else:
        total_w = widths

    row_start = np.zeros(n, dtype=np.int64)
    np.cumsum(total_w[:-1], out=row_start[1:])
    out = np.zeros(int(total_w.sum()), dtype=np.uint8)

    off = row_start.copy()
    if fixed_length:
        for k in range(10):
            m = plen > k
            chunk = (widths >> (7 * k)) & 0x7F
            out[(off + k)[m]] = np.where(k + 1 < plen, chunk | 0x80,
                                         chunk)[m]
        off = off + plen

    for tb, present, spec in plans:
        pos = off[present]
        for i, b in enumerate(tb):
            out[pos + i] = b
        if spec[0] == "varint":
            _, nb, bm = spec
            nb_p = nb[present]
            bm_p = bm[present]          # hoisted: masked copy once, not per k
            vpos = pos + len(tb)
            kmax = int(nb_p.max()) if nb_p.size else 0
            for k in range(kmax):
                m = nb_p > k
                out[(vpos + k)[m]] = bm_p[m, k]
            off = off + present * (len(tb) + nb)
        else:
            _, payloads, lens = spec
            lens_p = lens[present]
            out[pos + len(tb)] = lens_p          # length byte (< 128)
            joined = b"".join(payloads)
            pstart = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=pstart[1:])
            maxlen = int(lens.max()) if n else 0
            if maxlen:
                pbuf = np.frombuffer(joined + b"\x00" * maxlen,
                                     dtype=np.uint8)
                ppos = pos + len(tb) + 1
                pst = pstart[present]
                for k in range(maxlen):
                    m = lens_p > k
                    out[(ppos + k)[m]] = pbuf[(pst + k)[m]]
            off = off + present * (len(tb) + 1 + lens)

    raw = out.tobytes()
    ends = row_start + total_w
    return [raw[s:e] for s, e in zip(row_start.tolist(), ends.tolist())]


def decode_flow_batch_vectorized(bufs, *, fixed_length: bool = False
                                 ) -> pd.DataFrame:
    """Lockstep-vectorized wire decode: ~10× :func:`decode_flow_batch`.

    All messages advance ONE token per numpy iteration (read tag → read
    value → scatter into column arrays), so Python-level work is
    O(max fields per message) vectorized steps instead of O(rows × fields)
    interpreted ones. Assumes the common shape of this schema — tags ≤ 2
    bytes, varints ≤ 9 bytes, bytes-field lengths < 128; any message
    outside it (or with wire types 1/5) falls back to the scalar decoder,
    so the function accepts everything :func:`decode_flow_batch` does and
    returns identical frames (equivalence is property-tested)."""
    import numpy as np

    msgs = [b"" if b is None else bytes(b) for b in bufs]
    n = len(msgs)
    if n == 0:
        return decode_flow_batch(msgs, fixed_length=fixed_length)
    joined = b"".join(msgs)
    lens = np.fromiter(map(len, msgs), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    buf = np.frombuffer(joined + b"\x00" * 16, dtype=np.uint8)

    n_slots = len(_SLOT_NAMES)
    ints = np.zeros((n_slots, n), dtype=np.int64)
    # bytes fields: accumulate (row, start, len) index fragments per slot;
    # the actual byte slices are cut once at the end (one tight loop per
    # slot) — per-row dict stores measured 3× slower
    blob_frags: list[tuple] = []
    slot_lut, kind_lut = _vec_luts()

    pos = starts.copy()
    ends = starts + lens
    bad = np.zeros(n, dtype=bool)           # messages for scalar fallback

    if fixed_length:
        # framing prefix: varint message length (≤2 bytes covers len<16384;
        # longer prefixes bail to scalar)
        b0 = buf[pos].astype(np.int64)
        two = b0 >= 128
        b1 = buf[pos + 1].astype(np.int64)
        # lens > 0: an empty message has no prefix byte to read (its b0
        # is the NEXT message's first byte — garbage that must neither
        # mark it bad nor activate it; pos == ends keeps it inactive)
        bad |= (two & ((b1 >= 128) | (pos + 1 >= ends))) & (lens > 0)
        mlen = np.where(two, (b0 & 0x7F) | (b1 << 7), b0)
        plen = 1 + two.astype(np.int64)
        pos = pos + plen
        # a prefix overstating the actual bytes is malformed: route to
        # the scalar path (which raises "framed length overruns buffer")
        # instead of silently decoding the truncated view (round-7
        # review — the two decoders disagreed on the same bytes)
        bad |= (pos + mlen > ends) & (lens > 0)
        ends = np.minimum(ends, pos + mlen)

    weights = (128 ** np.arange(9, dtype=np.int64))
    koffs = np.arange(9, dtype=np.int64)[None, :]

    active = np.flatnonzero((pos < ends) & ~bad)
    while active.size:
        p = pos[active]
        b0 = buf[p].astype(np.int64)
        two = b0 >= 128
        b1 = buf[p + 1].astype(np.int64)
        # a 2-byte tag whose second byte lies PAST the message end would
        # silently read the next message's bytes out of the flat buffer
        # (round-7 review: truncated messages produced garbage rows where
        # the scalar decoder raises) — route such rows to the fallback
        overlong = two & ((b1 >= 128) | (p + 1 >= ends[active]))
        if overlong.any():
            bad[active[overlong]] = True
            keep = ~overlong
            active, p = active[keep], p[keep]
            b0, two, b1 = b0[keep], two[keep], b1[keep]
        tag = np.where(two, (b0 & 0x7F) | (b1 << 7), b0)
        tlen = 1 + two.astype(np.int64)
        num = tag >> 3
        wire = tag & 0x07
        unsupported = ((wire != 0) & (wire != 2)) | (num >= _MAX_NUM)
        if unsupported.any():
            # wire 1/5 or huge field numbers: scalar fallback for those
            bad[active[unsupported]] = True
            keep = ~unsupported
            active, p, tag = active[keep], p[keep], tag[keep]
            num, wire, tlen = num[keep], wire[keep], tlen[keep]

        newpos = np.empty_like(p)
        w0 = wire == 0
        if w0.any():
            vp = (p + tlen)[w0]
            win = buf[vp[:, None] + koffs].astype(np.int64)
            cont = win >= 128
            term = cont.argmin(axis=1)       # first non-continuation byte
            toolong = cont.all(axis=1)
            # varint bytes running past the message end read the NEXT
            # message in the flat buffer — fallback instead (round-7)
            cross = vp + term + 1 > ends[active[w0]]
            badv = toolong | cross
            if badv.any():
                bad[active[w0][badv]] = True
                term = np.where(toolong, 0, term)
            val = ((win & 0x7F) * weights * (koffs <= term[:, None])) \
                .sum(axis=1)
            sl = slot_lut[num[w0]]
            ok = sl >= 0
            ints[sl[ok], active[w0][ok]] = val[ok]
            newpos[w0] = vp + term + 1
        w2 = wire == 2
        if w2.any():
            lp = (p + tlen)[w2]
            e2 = ends[active[w2]]
            ln = buf[lp].astype(np.int64)
            # big: multi-byte length prefix; lp >= e2: the length byte
            # itself lies past the message end (truncated message whose
            # read would cross into the neighbor — round-7 review)
            big = (ln >= 128) | (lp >= e2)
            if big.any():
                bad[active[np.flatnonzero(w2)[big]]] = True
                ln = np.where(big, 0, ln)
            nums2 = num[w2]
            sl = slot_lut[nums2]
            st = lp + 1
            rows = active[w2]
            overrun = st + ln > e2     # payload crosses the message end
            if overrun.any():
                bad[rows[overrun]] = True
            keep = (sl >= 0) & (kind_lut[nums2] == 2) & ~overrun
            if keep.any():
                blob_frags.append((sl[keep], rows[keep], st[keep], ln[keep]))
            newpos[w2] = st + ln

        pos[active] = newpos
        sel = (pos[active] < ends[active]) & ~bad[active]
        active = active[sel]

    blob_arrays = {s: None for s, k in enumerate(_SLOT_KIND) if k == "bytes"}
    for s in blob_arrays:
        a = np.empty(n, dtype=object)
        a.fill(b"")
        blob_arrays[s] = a
    if blob_frags:
        all_sl = np.concatenate([f[0] for f in blob_frags]).tolist()
        all_rows = np.concatenate([f[1] for f in blob_frags]).tolist()
        all_st = np.concatenate([f[2] for f in blob_frags]).tolist()
        all_ln = np.concatenate([f[3] for f in blob_frags]).tolist()
        for s, r, st_, ln_ in zip(all_sl, all_rows, all_st, all_ln):
            blob_arrays[s][r] = joined[st_:st_ + ln_]

    out = {}
    bad_idx = np.flatnonzero(bad)
    for slot, name in enumerate(_SLOT_NAMES):
        if _SLOT_KIND[slot] == "bytes":
            out[name] = blob_arrays[slot]
        else:
            a = ints[slot]
            if name not in _LONG_FIELDS:
                a = a.astype("int32")
            out[name] = a
    pdf = pd.DataFrame(out)
    if bad_idx.size:
        fallback = decode_flow_batch([msgs[i] for i in bad_idx],
                                     fixed_length=fixed_length)
        for name in _SLOT_NAMES:
            col = pdf[name].to_numpy()
            col[bad_idx] = fallback[name].to_numpy()
            pdf[name] = col
    return pdf


# --- Spark column functions -------------------------------------------------

def to_flow_protobuf(df: DataFrame, *, fixed_length: bool = False) -> DataFrame:
    """DataFrame of flow columns → single binary column ``value``
    (S4: encode + optional length-delimited framing)."""
    cols = [c for c in df.columns if c in _NAME_TO_NUM]

    @pandas_udf(T.BinaryType())
    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            yield pd.Series(
                encode_flow_batch_vectorized(pdf, fixed_length=fixed_length),
                dtype=object)

    return df.select(enc(F.struct(*cols)).alias("value"))


def from_flow_protobuf(df: DataFrame, value_col: str = "value", *,
                       fixed_length: bool = False) -> DataFrame:
    """Binary column → typed flow columns (S3: the ClickHouse/inserter
    decode step). Missing proto3 fields surface as 0/empty defaults."""

    @pandas_udf(DECODED_SCHEMA)
    def dec(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            yield decode_flow_batch_vectorized(s, fixed_length=fixed_length)

    out = df.select(dec(F.col(value_col)).alias("flow")).select("flow.*")
    # proto3 default semantics: absent varint == 0, absent bytes == empty
    return out
