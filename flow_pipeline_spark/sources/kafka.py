"""Kafka edges (S1/S2/S6) — real code, gated on connector availability.

The reference consumes topic ``flows`` via a ClickHouse Kafka-engine table
(create.sh:28-34) or a sarama consumer group (inserter.go:176-196,238-256),
and produces with an async producer (mocker.go:36,103-106). Spark's Kafka
source subsumes both: offsets live in the checkpoint (replacing group
commits — SURVEY W6), partitions map to tasks (the topic's 2 partitions →
2 tasks; more partitions scale linearly).

The spark-sql-kafka connector jar is not bundled with this container's
pyspark; :func:`kafka_available` gates usage so the module imports cleanly
anywhere. On a real deployment: ``spark-submit --packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .protobuf import from_flow_protobuf, to_flow_protobuf


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def read_flow_stream(spark: SparkSession, brokers: str, topic: str = "flows",
                     *, starting_offsets: str = "latest",
                     fixed_length: bool = True) -> DataFrame:
    """S1/S2/S3 — streaming scan of the flows topic + protobuf decode.

    ``startingOffsets='latest'`` matches the Kafka engine's "fetches from
    the current offset" (README.md:115); checkpointing supplies resume.
    goflow produces length-prefixed protobuf (compose `-proto.fixedlen`),
    hence fixed_length=True by default.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return from_flow_protobuf(raw, "value", fixed_length=fixed_length)


def write_flow_stream(flows: DataFrame, brokers: str, topic: str = "flows",
                      checkpoint_dir: str | None = None, *,
                      fixed_length: bool = True):
    """S4/S6 — encode + produce (the mocker's output edge).

    ``checkpoint_dir`` must be provided and per-job unique: the old
    fixed default (``/tmp/flow-kafka-ckpt``) made two producer jobs
    started with defaults collide on one checkpoint location — the
    second start failed, or resumed from the first job's offsets
    (round-7 review; every writer in streaming/jobs.py already treats
    the checkpoint as a required parameter)."""
    if not checkpoint_dir:
        raise ValueError(
            "write_flow_stream: checkpoint_dir is required (per-job "
            "unique — a shared default collides across producers)")
    encoded = to_flow_protobuf(flows, fixed_length=fixed_length)
    return (
        encoded.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
