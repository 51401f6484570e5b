"""Executed Kafka read/write paths (VERDICT r04 item 6): the pure-Python
wire-protocol client + the in-process broker speaking real protocol bytes
over TCP, and the `kafka_py` DataSource's `.load()` / `readStream` paths
consuming through them — ops #14-20 driven end-to-end instead of
option-contract-only.
"""

from __future__ import annotations

import pytest

from kafka_avro_pipeline_java_spark.streaming.fake_broker import FakeKafkaBroker
from kafka_avro_pipeline_java_spark.streaming.kafka_wire import (
    EARLIEST,
    LATEST,
    KafkaWireClient,
    decode_message_set,
    encode_message_set,
)


@pytest.fixture()
def broker():
    with FakeKafkaBroker({"orders_avro": 3}) as b:
        yield b


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_message_set_round_trip_and_crc():
    recs = [(b"k1", b"v1", 1000), (None, b"v2", 2000), (b"k3", None, 3000)]
    buf = encode_message_set(recs, base_offset=7)
    out = decode_message_set(buf)
    assert [(r.key, r.value, r.timestamp) for r in out] == recs
    assert [r.offset for r in out] == [7, 8, 9]
    # flip one payload byte -> CRC must catch it
    tampered = bytearray(buf)
    tampered[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_message_set(bytes(tampered))
    # a trailing partial message (broker max_bytes cut) is dropped silently
    assert len(decode_message_set(buf[:-5])) == 2


# ---------------------------------------------------------------------------
# client <-> broker protocol
# ---------------------------------------------------------------------------


def test_protocol_round_trips(broker):
    broker.append("orders_avro", 0, [(b"a", b"1", 10), (b"b", b"2", 20)])
    with KafkaWireClient(broker.bootstrap) as c:
        versions = c.api_versions()
        assert versions[1] == (2, 4)  # Fetch v2..v4 advertised (v4 = magic 2)
        brokers, topics = c.metadata(["orders_avro"])
        assert topics == {"orders_avro": [0, 1, 2]}
        assert list(brokers.values())[0][0] == broker.host
        assert c.list_offsets("orders_avro", 0, EARLIEST) == 0
        assert c.list_offsets("orders_avro", 0, LATEST) == 2
        hw, recs = c.fetch("orders_avro", 0, 1)
        assert hw == 2
        assert [(r.offset, r.key, r.value) for r in recs] == [(1, b"b", b"2")]
        # produce through the protocol, then read back
        base = c.produce("orders_avro", 1, [(b"p", b"q", 30)])
        assert base == 0
        _, recs = c.fetch("orders_avro", 1, 0)
        assert [(r.key, r.value, r.timestamp) for r in recs] == [(b"p", b"q", 30)]


def test_protocol_error_paths(broker):
    with KafkaWireClient(broker.bootstrap) as c:
        with pytest.raises(KeyError):
            c.metadata(["no_such_topic"])
        with pytest.raises(RuntimeError, match="error 1"):  # OFFSET_OUT_OF_RANGE
            c.fetch("orders_avro", 0, 99)
        with pytest.raises(RuntimeError, match="error 3"):  # UNKNOWN_TOPIC
            c.fetch("no_such_topic", 0, 0)


def test_fetch_honors_max_bytes(broker):
    broker.append("orders_avro", 0, [(b"k", b"x" * 100, i) for i in range(50)])
    with KafkaWireClient(broker.bootstrap) as c:
        hw, recs = c.fetch("orders_avro", 0, 0, max_bytes=400)
        assert hw == 50
        assert 1 <= len(recs) < 50  # bounded batch, not the whole log
        # the poll loop pattern reaches the watermark in bounded steps
        got, offset = [], 0
        while offset < hw:
            _, batch = c.fetch("orders_avro", 0, offset, max_bytes=400)
            got.extend(batch)
            offset = batch[-1].offset + 1
        assert [r.offset for r in got] == list(range(50))


# ---------------------------------------------------------------------------
# batch .load() e2e
# ---------------------------------------------------------------------------


def _register(spark):
    from kafka_avro_pipeline_java_spark.sources.kafka_pyds import KafkaPyDataSource

    try:
        spark.dataSource.register(KafkaPyDataSource)
    except Exception:
        pass  # per-session singleton


def test_batch_load_one_split_per_kafka_partition(spark, broker):
    broker.append("orders_avro", 0, [(b"a", b"0", 1), (b"b", b"1", 2)])
    broker.append("orders_avro", 1, [(b"c", b"2", 3)])
    # partition 2 left empty -> planner must drop it
    _register(spark)
    df = (
        spark.read.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "orders_avro")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # non-empty Kafka partitions only
    rows = sorted(
        (r.partition, r.offset, bytes(r.key), bytes(r.value)) for r in df.collect()
    )
    assert rows == [(0, 0, b"a", b"0"), (0, 1, b"b", b"1"), (1, 0, b"c", b"2")]


def test_batch_load_avro_round_trip(spark, broker):
    """Ops #14/15/20 executed end-to-end: Confluent-framed Avro produced
    through the wire protocol, scanned with .load(), decoded to typed
    columns with the repo codec."""
    from kafka_avro_pipeline_java_spark.streaming.avro_codec import (
        decode_df,
        encode_record,
        frame_confluent,
    )

    schema = {
        "type": "record",
        "name": "orders_avro",
        "fields": [
            {"name": "order_id", "type": "string"},
            {"name": "amount", "type": "long"},
        ],
    }
    ftypes = [("order_id", "string"), ("amount", "long")]
    with KafkaWireClient(broker.bootstrap) as c:
        for i in range(10):
            body = encode_record(ftypes, [f"o{i}", i * 100])
            c.produce(
                "orders_avro",
                i % 3,
                [(f"o{i}".encode(), frame_confluent(body, schema_id=1), i)],
            )
    _register(spark)
    raw = (
        spark.read.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "orders_avro")
        .load()
    )
    typed = decode_df(raw.select("value"), schema)
    got = {r.order_id: r.amount for r in typed.collect()}
    assert got == {f"o{i}": i * 100 for i in range(10)}


# ---------------------------------------------------------------------------
# streaming readStream e2e
# ---------------------------------------------------------------------------


def test_stream_bounded_batches_and_restart_no_dup_no_loss(spark, broker, tmp_path):
    """The reference consumer's whole lifecycle on the executed path:
    bounded poll admission (maxRecordsPerBatch), offset checkpointing,
    and restart that resumes exactly after the last committed offset."""
    broker.append("orders_avro", 0, [(b"k%d" % i, b"v%d" % i, i) for i in range(4)])
    broker.append("orders_avro", 1, [(b"x%d" % i, b"y%d" % i, i) for i in range(3)])
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, int, bytes]] = []
    batch_sizes: list[int] = []

    def run_stream(expect_total: int):
        # Python micro-batch sources don't support Trigger.AvailableNow
        # (single-batch fallback), so drain with processAllAvailable and
        # poll until the expected record count lands.
        import time

        stream = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "orders_avro")
            .option("maxRecordsPerBatch", "3")
            .load()
        )

        def sink(df, epoch_id):
            rows = df.collect()
            batch_sizes.append(len(rows))
            seen.extend((r.partition, r.offset, bytes(r.value)) for r in rows)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and len(seen) < expect_total:
                q.processAllAvailable()
        finally:
            q.stop()

    run_stream(7)
    assert all(b <= 3 for b in batch_sizes if b), batch_sizes
    assert len(seen) == 7
    # append MORE records, restart from the same checkpoint: the second
    # run must deliver exactly the new records (no duplicates, no loss)
    broker.append("orders_avro", 2, [(b"z", b"new0", 9)])
    broker.append("orders_avro", 0, [(b"k9", b"new1", 9)])
    n_before = len(seen)
    run_stream(9)
    new = seen[n_before:]
    assert sorted(v for _, _, v in new) == [b"new0", b"new1"]
    assert len(seen) == len(set(seen)) == 9
