"""Kafka source/sink wrappers (Structured Streaming first).

Maps the reference's hand-rolled consumer/producer topology onto Spark's
Kafka connector (SURVEY.md §3.4):

- partition discovery + thread-per-partition (reference
  ``03-consumer/src/main/java/Main.java:28-64``) → the Kafka source plans
  one task per topic-partition natively;
- poll loop with ``max.poll.records`` bound (``AvroConsumer.java:116-138``)
  → micro-batches bounded by ``maxOffsetsPerTrigger``;
- blocking-queue backpressure (``AvroConsumer.java:142-155``) → pull-based
  micro-batch admission (rate bounded by the same option);
- DB-stored offsets + seek (``MySQLProcessData.java:42-63``) → checkpoint
  recovery; ``startingOffsets=earliest`` is the cold-start default
  (``AvroConsumer.java:66``).

This container has no spark-sql-kafka jar and no broker, so everything is
gated on ``kafka_available``; the codec layer (avro_codec) is independently
testable and the composition is exercised with the file streaming source in
tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import partition_for_key
from .avro_codec import decode_df, encode_df


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "localhost:0"
        ).load()
        return True
    except Exception as e:  # jar missing → DATA_SOURCE_NOT_FOUND
        return "DATA_SOURCE_NOT_FOUND" not in str(e) and "Failed to find" not in str(e)


def kafka_source_options(
    brokers: str,
    topics: str | None = None,
    *,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    group_id: str | None = None,
) -> dict[str, str]:
    """The OPTION CONTRACT of the Kafka source, as a pure function — the
    part of partition discovery/assignment (reference
    ``03-consumer/src/main/java/Main.java:28-64``: partitionsFor() then one
    consumer thread per partition) that is testable without a broker or
    the spark-sql-kafka jar (tests/test_infra_contract.py).

    Exactly one of ``topics`` (subscribe mode — the source DISCOVERS
    partitions and plans one task per topic-partition, the reference's
    thread-per-partition topology) or ``assign`` (explicit
    {topic: [partition,...]} placement — the reference's
    ``consumer.assign(...)`` path, serialized to the connector's JSON
    assign format) must be given."""
    import json as _json

    if (topics is None) == (assign is None):
        raise ValueError("exactly one of topics= or assign= is required")
    opts = {
        "kafka.bootstrap.servers": brokers,
        "startingOffsets": starting_offsets,
    }
    if topics is not None:
        opts["subscribe"] = topics
    else:
        opts["assign"] = _json.dumps(
            {t: sorted(ps) for t, ps in sorted(assign.items())}
        )
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id is not None:
        # parity with the reference's group-per-topic naming
        # (AvroConsumer.java:50: "group-" + topic)
        opts["kafka.group.id"] = group_id
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str | None = None,
    *,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    group_id: str | None = None,
) -> DataFrame:
    """Raw Kafka stream (key/value binary + topic/partition/offset) in
    subscribe (discovery) or assign (explicit placement) mode."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        brokers,
        topics,
        assign=assign,
        starting_offsets=starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
        group_id=group_id,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def decode_kafka_stream(raw: DataFrame, avro_schema: dict[str, Any]) -> DataFrame:
    """Confluent-framed Avro values → typed columns (+ Kafka metadata)."""
    typed = decode_df(raw.select("value"), avro_schema)
    return typed


def prepare_kafka_batch(
    df: DataFrame,
    avro_schema: dict[str, Any],
    *,
    schema_id: int = 1,
    explicit_partitions: int | None = None,
) -> DataFrame:
    """Rows → (key, value[, partition]) binary columns ready for the Kafka
    sink. Key = Avro field 0 (reference AvroProducer.java:81). With
    ``explicit_partitions``, adds the reference's exact placement
    ``pmod(java_hashCode(key), n)`` (AvroProducer.java:82) — otherwise the
    sink's murmur2-on-key default preserves the same same-key→same-partition
    invariant without byte-identical placement."""
    key_field = avro_schema["fields"][0]["name"]
    if explicit_partitions is not None:
        with_part = df.withColumn(
            "partition",
            partition_for_key(F.col(key_field).cast("string"), explicit_partitions),
        )
        return encode_df(
            with_part, avro_schema, schema_id=schema_id, passthrough_cols=["partition"]
        )
    return encode_df(df, avro_schema, schema_id=schema_id)


def write_kafka_batch(df: DataFrame, brokers: str, topic: str) -> None:
    """(key,value) binary DataFrame → Kafka topic (batch)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )


def write_kafka_stream(
    df: DataFrame, brokers: str, topic: str, checkpoint_dir: str
):
    """(key,value) binary streaming DataFrame → Kafka topic."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
