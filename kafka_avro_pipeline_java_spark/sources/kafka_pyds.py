"""Kafka as a Python DataSource (Spark 4) over the pure-Python wire client.

The JVM `format("kafka")` connector needs the spark-sql-kafka jar, which
this container lacks — so ops #15-17 (Kafka scan, partition discovery,
partition assignment) previously had only option-contract tests. This
module gives them an EXECUTED ``.load()`` path: a `pyspark.sql.datasource`
connector whose planning and reading mirror the JVM source's topology
exactly, speaking real protocol bytes through
``streaming/kafka_wire.py``:

- ``partitions()`` asks the broker for Metadata and returns ONE input
  partition per Kafka topic-partition — the reference's
  thread-per-partition consumer fan-out (03-consumer Main.java:28-64)
  expressed as engine-planned splits; a 1000-executor cluster reads 1000
  Kafka partitions concurrently with no coordinator bottleneck.
- each ``read()`` runs in a Spark worker process, opens its own socket,
  seeks (ListOffsets earliest → start), and drives the bounded fetch loop
  (AvroConsumer.java:116-138) until the high watermark observed at scan
  start — a consistent snapshot per partition.
- the streaming half is a micro-batch source with explicit offset
  bookkeeping ({partition: next_offset} dicts, JSON-checkpointed by the
  engine) and per-batch admission bounded by ``maxRecordsPerBatch`` —
  the same backpressure contract as maxOffsetsPerTrigger; replays after
  restart re-fetch the identical offset range (exactly-once recovery
  needs source determinism, and a Kafka offset range IS deterministic).

Output schema mirrors the JVM connector: (key binary, value binary,
topic string, partition int, offset bigint, timestamp bigint).

Options: ``bootstrap`` (host:port), ``topic``, batch ``maxBytes`` per
fetch (default 1 MiB), streaming ``maxRecordsPerBatch`` (default 1000).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp bigint"
)


class _TopicPartition(InputPartition):
    def __init__(self, topic: str, partition: int, start: int, end: int):
        self.topic, self.partition = topic, partition
        self.start, self.end = start, end


def _client(options):
    # leader-routing client: on a single-node broker it degrades to one
    # extra Metadata round-trip; on a multi-broker cluster each
    # list_offsets/fetch goes to the partition leader and survives one
    # leader move per call (round 6 — was the single-socket
    # KafkaWireClient, which a follower would bounce with
    # NOT_LEADER_FOR_PARTITION)
    from ..streaming.kafka_wire import KafkaClusterClient

    return KafkaClusterClient(options["bootstrap"])


class KafkaPyBatchReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.topic = options["topic"]
        self.max_bytes = int(options.get("maxBytes", str(1 << 20)))

    def partitions(self):
        """Partition discovery + snapshot bounds, one Metadata +
        2×ListOffsets round-trips per partition at PLAN time; the data
        fetches all happen inside the per-partition readers."""
        from ..streaming.kafka_wire import EARLIEST, LATEST

        with _client(self.options) as c:
            _, topics = c.metadata([self.topic])
            out = []
            for pid in topics[self.topic]:
                lo = c.list_offsets(self.topic, pid, EARLIEST)
                hi = c.list_offsets(self.topic, pid, LATEST)
                if hi > lo:
                    out.append(_TopicPartition(self.topic, pid, lo, hi))
            return out

    def read(self, part: _TopicPartition):
        """Bounded poll loop to the snapshot end — runs in the worker."""
        with _client(self.options) as c:
            offset = part.start
            while offset < part.end:
                _, records = c.fetch(
                    part.topic, part.partition, offset, max_bytes=self.max_bytes
                )
                if not records:
                    # caught-up inside the snapshot: the broker answered
                    # success with no data (e.g. max_bytes smaller than
                    # the next record after a compaction). NOTE: a log
                    # truncated BELOW the snapshot start does NOT land
                    # here — the broker answers OFFSET_OUT_OF_RANGE,
                    # which KafkaWireClient.fetch raises and the task
                    # fails, matching the JVM connector's default
                    # failOnDataLoss=true contract (ADVICE r05).
                    break
                for r in records:
                    if r.offset >= part.end:
                        return
                    yield (r.key, r.value, part.topic, part.partition,
                           r.offset, r.timestamp)
                offset = records[-1].offset + 1


class KafkaPyStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offsets are {"offsets": {partition(str): next}}
    (string keys — the engine JSON-serializes offsets into the checkpoint
    log). ``read`` advances at most maxRecordsPerBatch records per batch
    across partitions, round-robin by partition id, so one hot partition
    cannot starve the others."""

    def __init__(self, options):
        self.options = options
        self.topic = options["topic"]
        self.max_records = int(options.get("maxRecordsPerBatch", "1000"))
        self.max_bytes = int(options.get("maxBytes", str(1 << 20)))

    def initialOffset(self):
        from ..streaming.kafka_wire import EARLIEST

        with _client(self.options) as c:
            _, topics = c.metadata([self.topic])
            return {
                "offsets": {
                    str(pid): c.list_offsets(self.topic, pid, EARLIEST)
                    for pid in topics[self.topic]
                }
            }

    def _fetch_range(self, c, pid: int, lo: int, hi: int):
        rows = []
        offset = lo
        while offset < hi:
            _, records = c.fetch(self.topic, pid, offset, max_bytes=self.max_bytes)
            if not records:
                break
            for r in records:
                if r.offset >= hi:
                    break
                rows.append((r.key, r.value, self.topic, pid, r.offset, r.timestamp))
            offset = records[-1].offset + 1
        return rows

    def read(self, start):
        from ..streaming.kafka_wire import LATEST

        cur = dict(start["offsets"])
        with _client(self.options) as c:
            hw = {
                pid: c.list_offsets(self.topic, int(pid), LATEST) for pid in cur
            }
            budget = self.max_records
            ends: dict[str, int] = {}
            # round-robin admission: one record per partition per pass
            # until the budget or every watermark is reached
            cursors = {pid: cur[pid] for pid in cur}
            progressing = True
            while budget > 0 and progressing:
                progressing = False
                for pid in sorted(cursors, key=int):
                    if budget <= 0:
                        break
                    if cursors[pid] < hw[pid]:
                        cursors[pid] += 1
                        budget -= 1
                        progressing = True
            for pid in cur:
                ends[pid] = cursors[pid]
            rows = []
            for pid in sorted(cur, key=int):
                if ends[pid] > cur[pid]:
                    rows.extend(
                        self._fetch_range(c, int(pid), cur[pid], ends[pid])
                    )
        return (iter(rows), {"offsets": ends})

    def readBetweenOffsets(self, start, end):
        """Replay path after restart: re-fetch the exact offset range —
        Kafka offsets make the replay byte-identical."""
        rows = []
        with _client(self.options) as c:
            for pid, lo in start["offsets"].items():
                hi = end["offsets"][pid]
                if hi > lo:
                    rows.extend(self._fetch_range(c, int(pid), lo, hi))
        return iter(rows)


class KafkaPyDataSource(DataSource):
    """``spark.dataSource.register(KafkaPyDataSource)`` then
    ``spark.read.format("kafka_py").option("bootstrap", ...)
    .option("topic", ...).load()`` (batch) or the same through
    ``spark.readStream`` (micro-batch streaming)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_py"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> KafkaPyBatchReader:
        return KafkaPyBatchReader(self.options)

    def simpleStreamReader(self, schema) -> KafkaPyStreamReader:
        return KafkaPyStreamReader(self.options)
