"""Kafka edge (S1/S2/S6) — what CAN be proven without the connector jar.

The sandbox has no spark-sql-kafka jar and no network, so the broker hop
itself is unexecutable here (documented environment impossibility; a real
deployment adds ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13``).
These tests pin everything AROUND that hop:

- the gate reports availability truthfully (no crash on missing classes);
- the exact decode pipeline ``read_flow_stream`` applies to a Kafka record
  batch is run against a DataFrame with the Kafka source's precise output
  schema (key/value/topic/partition/offset/timestamp/timestampType), so the
  only untested behavior is Kafka's own delivery — the column contract,
  framing, and codec are fully exercised;
- if a jar IS present (real deployment), the gated builders construct.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flow_pipeline_spark.sources.kafka import kafka_available, read_flow_stream
from flow_pipeline_spark.sources.mocker import synthetic_flows
from flow_pipeline_spark.sources.protobuf import (
    FLOW_FIELDS,
    _PROTO_TYPES,
    _read_varint,
    flow_descriptor_set,
    from_flow_protobuf,
    to_flow_protobuf,
)

# Exact deployment coordinates (see KAFKA_EDGE.md for the impossibility note)
KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
PROTOBUF_PKG = "org.apache.spark:spark-protobuf_2.13:4.1.2"


def _protobuf_jar_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst")
        return True
    except Exception:
        return False

# the spark-sql-kafka source's fixed output schema (Spark docs, "Structured
# Streaming + Kafka Integration Guide"): every record surfaces these 7 cols
KAFKA_RECORD_SCHEMA = T.StructType([
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("timestampType", T.IntegerType()),
])


def test_kafka_gate_is_truthful(spark):
    """kafka_available never raises; in this container it must report the
    documented impossibility (no jar), and the streaming builder must fail
    CLEANLY (AnalysisException at source resolution), not corrupt state."""
    if kafka_available(spark):
        # real deployment: the builders must construct without error
        read_flow_stream(spark, "localhost:9092")
        return
    try:
        read_flow_stream(spark, "localhost:9092")
        raise AssertionError("expected source-resolution failure without jar")
    except Exception as e:  # noqa: BLE001 — any clean analysis error is fine
        assert "kafka" in str(e).lower()


def test_kafka_shaped_batch_decodes_identically(spark):
    """The decode chain read_flow_stream applies — from_flow_protobuf on the
    ``value`` column of a Kafka-schema record batch — must yield exactly the
    rows of the original flow frame, with the extra Kafka metadata columns
    present and untouched. This is the from_protobuf-equivalence contract:
    swap the batch source for the real Kafka stream and the plan below the
    source node is identical."""
    flows = synthetic_flows(spark, 500, seed=7)
    wire = to_flow_protobuf(flows, fixed_length=True)  # goflow framing

    # wrap the wire bytes in the Kafka source's record shape
    kafka_shaped = (
        wire.withColumn("key", F.lit(None).cast("binary"))
        .withColumn("topic", F.lit("flows"))
        .withColumn("partition",
                    (F.monotonically_increasing_id() % 2).cast("int"))
        .withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0))
        .select([f.name for f in KAFKA_RECORD_SCHEMA.fields])
    )
    # names + types must match the Kafka source contract (nullability is a
    # property of the literal wrapping here, not of the contract)
    assert [(f.name, f.dataType) for f in kafka_shaped.schema.fields] == \
           [(f.name, f.dataType) for f in KAFKA_RECORD_SCHEMA.fields]

    decoded = from_flow_protobuf(kafka_shaped, "value", fixed_length=True)
    direct = from_flow_protobuf(wire, "value", fixed_length=True)

    a = decoded.orderBy("SequenceNum").collect()
    b = direct.orderBy("SequenceNum").collect()
    assert a == b
    assert len(a) == 500
    # partition fan-out model: the topic's 2 partitions → 2 task groups
    assert kafka_shaped.select("partition").distinct().count() == 2


def _walk_descriptor(buf: bytes):
    """Minimal independent wire-walk of a FileDescriptorSet: recover
    (package, message_name, [(field_name, number, type)], enum_names).
    Deliberately re-implements the parse (not via flow_descriptor_set's own
    helpers) so encoder bugs can't self-certify."""
    def fields_of(b):
        pos, out = 0, []
        while pos < len(b):
            tag, pos = _read_varint(b, pos)
            num, wire = tag >> 3, tag & 7
            if wire == 0:
                v, pos = _read_varint(b, pos)
                out.append((num, v))
            elif wire == 2:
                ln, pos = _read_varint(b, pos)
                out.append((num, b[pos:pos + ln]))
                pos += ln
            else:
                raise AssertionError(f"unexpected wire type {wire}")
        return out

    (n1, file_pb), = fields_of(buf)
    assert n1 == 1
    file_fields = fields_of(file_pb)
    package = next(v for n, v in file_fields if n == 2).decode()
    msg_pb = next(v for n, v in file_fields if n == 4)
    msg_fields = fields_of(msg_pb)
    msg_name = next(v for n, v in msg_fields if n == 1).decode()
    triples = []
    for n, v in msg_fields:
        if n != 2:
            continue
        fd = fields_of(v)
        d = dict(fd)
        triples.append((d[1].decode(), d[3], d[5]))
    enum_pb = next(v for n, v in msg_fields if n == 4)
    enum_fields = fields_of(enum_pb)
    enum_values = [dict(fields_of(v))[2] for n, v in enum_fields if n == 2]
    return package, msg_name, triples, enum_values


def test_descriptor_set_structure_matches_flow_proto():
    """The hand-encoded FileDescriptorSet walks cleanly with an independent
    parser and declares exactly flow.proto's package, message, field
    numbers/types (pb-ext/flow.proto:1-65) — i.e. what protoc would emit."""
    package, msg, triples, enum_vals = _walk_descriptor(flow_descriptor_set())
    assert package == "flowprotob"
    assert msg == "FlowMessage"
    got = {(name, num) for name, num, _ in triples}
    want = {(name, num) for num, (name, _) in FLOW_FIELDS.items()}
    assert got == want
    for name, num, ptype in triples:
        assert ptype == _PROTO_TYPES[num], (name, num, ptype)
    assert enum_vals == [0, 1, 2, 3, 4]  # FlowType values, flow.proto:9-15


def test_native_from_protobuf_parity(spark):
    """Jar-gated (SURVEY S3/S4 preferred mapping): native from_protobuf on
    the hand-built descriptor set must agree with the self-built codec on
    the mocker corpus. Skips (with the exact deployment coordinate) in this
    container — the spark-protobuf jar is not bundled and the sandbox has no
    network (KAFKA_EDGE.md); runs unmodified once the jar is present."""
    if not _protobuf_jar_available(spark):
        pytest.skip(f"spark-protobuf jar absent; deploy with --packages "
                    f"{PROTOBUF_PKG} (no-network sandbox: KAFKA_EDGE.md)")

    from pyspark.sql.protobuf.functions import from_protobuf

    flows = synthetic_flows(spark, 500, seed=11)
    wire = to_flow_protobuf(flows, fixed_length=False)
    native = wire.select(
        from_protobuf(
            "value", "flowprotob.FlowMessage",
            binaryDescriptorSet=flow_descriptor_set(),
            options={"enums.as.ints": "true"},
        ).alias("m")
    ).select("m.*")
    ours = from_flow_protobuf(wire, "value", fixed_length=False)

    # proto3 surface difference only: native materializes zero-defaults for
    # absent singular fields, the self-built codec leaves them null — both
    # mean "0" in proto3, so compare under coalesce
    names = sorted(f[0] for f in FLOW_FIELDS.values())
    def norm(df):
        cols = []
        for c in names:
            dt = dict(df.dtypes)[c]
            zero = F.lit(b"") if dt == "binary" else F.lit(0)
            cols.append(F.coalesce(F.col(c).cast(dt), zero.cast(dt)).alias(c))
        return df.select(cols).orderBy("SequenceNum")

    assert norm(native).collect() == norm(ours).collect()


def test_kafka_roundtrip_e2e(spark, tmpdir):
    """Jar+broker-gated S1/S6 end-to-end: produce framed protobuf to a real
    topic, stream-decode with read_flow_stream, and the Date-partitioned
    result must equal the batch decode of the same frames. Needs the
    spark-sql-kafka jar AND a reachable broker (KAFKA_BOOTSTRAP env);
    documents the exact gap KAFKA_EDGE.md describes, runs unmodified on a
    real deployment."""
    if not kafka_available(spark):
        pytest.skip(f"spark-sql-kafka jar absent; deploy with --packages "
                    f"{KAFKA_PKG} (no-network sandbox: KAFKA_EDGE.md)")
    brokers = os.environ.get("KAFKA_BOOTSTRAP")
    if not brokers:
        pytest.skip("no broker: set KAFKA_BOOTSTRAP=host:port "
                    "(e.g. an embedded KRaft broker fixture)")

    from flow_pipeline_spark.sources.kafka import write_flow_stream
    from flow_pipeline_spark.sources.mocker import flows_raw

    topic = "flows_e2e_test"
    flows = synthetic_flows(spark, 1000, seed=13)
    # produce (batch write through the same encode path as write_flow_stream)
    (to_flow_protobuf(flows, fixed_length=True)
     .selectExpr("CAST(NULL AS BINARY) AS key", "value")
     .write.format("kafka")
     .option("kafka.bootstrap.servers", brokers)
     .option("topic", topic).save())

    stream = read_flow_stream(spark, brokers, topic,
                              starting_offsets="earliest")
    out_dir, ckpt = f"{tmpdir}/kafka_out", f"{tmpdir}/kafka_ckpt"
    q = (flows_raw(stream).writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .partitionBy("Date").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).orderBy("SequenceNum")
    want = flows_raw(flows).orderBy("SequenceNum")
    assert [r.asDict() for r in got.collect()] == \
           [r.asDict() for r in want.collect()]


def test_write_flow_stream_requires_checkpoint_dir(spark):
    """Round-7 review: the fixed /tmp default made two producer jobs
    started with defaults collide on one checkpoint location (the
    second resumed from the first's offsets). The checkpoint is now a
    required, per-job argument — enforced before any Kafka machinery,
    so this pins jarlessly."""
    from flow_pipeline_spark.sources.kafka import write_flow_stream
    from flow_pipeline_spark.sources.mocker import synthetic_flows

    flows = synthetic_flows(spark, 10, seed=1)
    with pytest.raises(ValueError, match="checkpoint_dir is required"):
        write_flow_stream(flows, "localhost:9092", "flows")
