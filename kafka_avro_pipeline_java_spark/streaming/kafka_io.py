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

This container has no spark-sql-kafka jar and no broker, so the JVM paths
are gated on ``kafka_available``; the codec layer (avro_codec) is
independently testable and the composition is exercised with the file
streaming source in tests/test_streaming.py. The EXECUTED read/write path
(round 5) is the pure-Python protocol stack: ``kafka_wire.py`` (client) +
``sources/kafka_pyds.py`` (DataSource) consume real wire bytes —
``read_kafka_stream_py`` below plans one task per topic-partition and
checkpoints offsets exactly like the JVM source, e2e-tested against the
in-process broker (tests/test_kafka_wire.py).
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


def read_kafka_stream_py(
    spark: SparkSession,
    brokers: str,
    topic: str,
    *,
    max_records_per_batch: int | None = None,
) -> DataFrame:
    """Raw Kafka micro-batch stream through the pure-Python protocol
    DataSource (``format("kafka_py")``) — the jar-free twin of
    ``read_kafka_stream`` with the same output schema and the same
    bounded-admission knob (``max_records_per_batch`` ↔
    maxOffsetsPerTrigger). Registration is idempotent per session."""
    from ..sources.kafka_pyds import KafkaPyDataSource

    try:
        spark.dataSource.register(KafkaPyDataSource)
    except Exception:
        pass  # already registered in this session
    reader = (
        spark.readStream.format("kafka_py")
        .option("bootstrap", brokers)
        .option("topic", topic)
    )
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
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


def write_kafka_batch_py(
    df: DataFrame, brokers: str, topic: str, *, timestamp_ms: int = 0
) -> None:
    """(key, value[, partition]) binary DataFrame → Kafka topic through the
    pure-Python wire protocol (Produce v2) — the jar-free twin of
    ``write_kafka_batch``, executed ON THE EXECUTORS: each Spark partition
    opens one socket and sends one Produce request per Kafka partition it
    holds rows for, so the send path fans out with the cluster exactly
    like the JVM producer pool (reference 02-producer Main.java:45-49).
    Pass the ``partition`` column from ``prepare_kafka_batch(...,
    explicit_partitions=n)`` for the reference's exact
    ``abs(java_hashCode(field0) % n)`` placement (AvroProducer.java:82);
    without one, placement hashes the serialized key bytes against the
    topic's live partition count — not byte-identical to any JVM
    partitioner, but it preserves the invariant that matters
    (same key → same partition → per-key order)."""
    cols = set(df.columns)
    if "partition" not in cols:
        from ..streaming.kafka_wire import KafkaWireClient

        with KafkaWireClient(brokers) as c:
            _, topics = c.metadata([topic])
            n_parts = len(topics[topic])
        df = df.withColumn(
            "partition",
            # null keys are legal in Kafka (the Java producer round-robins
            # them); partition_for_key yields null on a null key, which
            # would TypeError in send_partition — route them to 0
            # (deterministic, keeps the executor loop total)
            F.coalesce(
                partition_for_key(F.col("key").cast("string"), n_parts),
                F.lit(0),
            ),
        )

    def send_partition(rows) -> None:
        # leader-routing producer (round 6): each Kafka partition's batch
        # goes to that partition's leader broker, like the Java client
        from ..streaming.kafka_wire import KafkaClusterClient

        by_kafka_partition: dict[int, list] = {}
        for r in rows:
            by_kafka_partition.setdefault(int(r["partition"]), []).append(
                (bytes(r["key"]) if r["key"] is not None else None,
                 bytes(r["value"]) if r["value"] is not None else None,
                 timestamp_ms)
            )
        if not by_kafka_partition:
            return
        with KafkaClusterClient(brokers) as c:
            for pid, records in sorted(by_kafka_partition.items()):
                c.produce(topic, pid, records)

    df.select("key", "value", "partition").foreachPartition(send_partition)


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
