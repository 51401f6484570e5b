"""Pure-Python Kafka wire protocol: codec + minimal client.

The reference talks to Kafka through the Java client jars
(``02-producer/.../AvroProducer.java:83-90`` send path,
``03-consumer/.../AvroConsumer.java:116-138`` poll loop); this container
has neither the spark-sql-kafka jar nor a broker, so the executed-read
story is built from the protocol itself: the Apache Kafka wire format is
a public, versioned binary protocol (kafka.apache.org/protocol), and the
subset below — Metadata v0, ListOffsets v1, Fetch v2, Produce v2,
ApiVersions v0, message format v1 (magic 1, CRC-checked) — is enough for
a correct bounded consumer and producer. The codec is shared by the
client here and the in-process broker in ``fake_broker.py``, so both
sides of every test exchange REAL protocol bytes over a REAL TCP socket.

Scale shape: one socket per (client, broker); the DataSource built on top
(sources/kafka_pyds.py) opens its connection INSIDE the per-partition
reader, so a 1000-executor cluster fans out exactly like the JVM
connector — this module never aggregates across partitions.

Single-node routing: ``KafkaWireClient`` sends every request to its
bootstrap address. A multi-broker deployment would route fetches to each
partition's leader from the Metadata response (exposed by
``metadata()``); the leader-routing loop is deliberately out of scope —
the sandbox broker is one node, and the JVM connector owns that concern
in production.
"""

from __future__ import annotations

import socket
import struct
import zlib
from dataclasses import dataclass

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3

EARLIEST = -2
LATEST = -1

# (api_key, min_version, max_version) advertised by the fake broker and
# asserted by the client handshake.
SUPPORTED_APIS = [
    (API_PRODUCE, 2, 2),
    (API_FETCH, 2, 2),
    (API_LIST_OFFSETS, 1, 1),
    (API_METADATA, 0, 0),
    (API_VERSIONS, 0, 0),
]


class ByteWriter:
    """Append-only big-endian encoder for the classic (non-compact,
    non-flexible) protocol encodings used by the API versions above."""

    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def int8(self, v: int) -> "ByteWriter":
        self._parts.append(struct.pack(">b", v))
        return self

    def int16(self, v: int) -> "ByteWriter":
        self._parts.append(struct.pack(">h", v))
        return self

    def int32(self, v: int) -> "ByteWriter":
        self._parts.append(struct.pack(">i", v))
        return self

    def uint32(self, v: int) -> "ByteWriter":
        self._parts.append(struct.pack(">I", v))
        return self

    def int64(self, v: int) -> "ByteWriter":
        self._parts.append(struct.pack(">q", v))
        return self

    def string(self, v: str | None) -> "ByteWriter":
        if v is None:
            return self.int16(-1)
        b = v.encode("utf-8")
        self.int16(len(b))
        self._parts.append(b)
        return self

    def bytes_(self, v: bytes | None) -> "ByteWriter":
        if v is None:
            return self.int32(-1)
        self.int32(len(v))
        self._parts.append(v)
        return self

    def raw(self, v: bytes) -> "ByteWriter":
        self._parts.append(v)
        return self

    def array(self, items, encode_item) -> "ByteWriter":
        if items is None:
            return self.int32(-1)
        self.int32(len(items))
        for it in items:
            encode_item(self, it)
        return self

    def build(self) -> bytes:
        return b"".join(self._parts)


class ByteReader:
    """Sequential big-endian decoder — the mirror of ByteWriter."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError(f"need {n} bytes at {self.pos}, have {len(self.buf)}")
        b = self.buf[self.pos: self.pos + n]
        self.pos += n
        return b

    def int8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def int16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def uint32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def int64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.int16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.int32()
        return None if n < 0 else self._take(n)

    def array(self, decode_item) -> list | None:
        n = self.int32()
        if n < 0:
            return None
        return [decode_item(self) for _ in range(n)]

    def remaining(self) -> bytes:
        return self.buf[self.pos:]


# ---------------------------------------------------------------------------
# message format v1 (magic 1): the record encoding inside Fetch/Produce
# record sets. CRC32 covers magic..value, exactly per the spec.
# ---------------------------------------------------------------------------


@dataclass
class WireRecord:
    offset: int
    timestamp: int
    key: bytes | None
    value: bytes | None


def encode_message_set(records: list[tuple[bytes | None, bytes | None, int]],
                       base_offset: int = 0) -> bytes:
    """[(key, value, timestamp_ms)] → a magic-1 MessageSet."""
    w = ByteWriter()
    for i, (key, value, ts) in enumerate(records):
        body = (
            ByteWriter()
            .int8(1)           # magic
            .int8(0)           # attributes: no compression
            .int64(ts)
            .bytes_(key)
            .bytes_(value)
            .build()
        )
        msg = ByteWriter().uint32(zlib.crc32(body) & 0xFFFFFFFF).raw(body).build()
        w.int64(base_offset + i).int32(len(msg)).raw(msg)
    return w.build()


def decode_message_set(buf: bytes) -> list[WireRecord]:
    """MessageSet bytes → records, verifying each CRC. A trailing partial
    message (the broker may cut a set at max_bytes) is silently dropped,
    per the consumer contract."""
    out: list[WireRecord] = []
    r = ByteReader(buf)
    while len(buf) - r.pos >= 12:
        offset = r.int64()
        size = r.int32()
        if len(buf) - r.pos < size:
            break  # partial trailing message
        msg = ByteReader(r._take(size))
        crc = msg.uint32()
        body_start = msg.pos
        magic = msg.int8()
        if magic != 1:
            raise ValueError(f"unsupported message magic {magic}")
        msg.int8()  # attributes
        ts = msg.int64()
        key = msg.bytes_()
        value = msg.bytes_()
        actual = zlib.crc32(msg.buf[body_start: msg.pos]) & 0xFFFFFFFF
        if actual != crc:
            raise ValueError(f"CRC mismatch at offset {offset}")
        out.append(WireRecord(offset, ts, key, value))
    return out


# ---------------------------------------------------------------------------
# request/response framing
# ---------------------------------------------------------------------------


def encode_request(api_key: int, api_version: int, correlation_id: int,
                   client_id: str | None, body: bytes) -> bytes:
    payload = (
        ByteWriter()
        .int16(api_key)
        .int16(api_version)
        .int32(correlation_id)
        .string(client_id)
        .raw(body)
        .build()
    )
    return struct.pack(">i", len(payload)) + payload


def read_frame(sock: socket.socket) -> bytes:
    head = _recv_exact(sock, 4)
    (n,) = struct.unpack(">i", head)
    return _recv_exact(sock, n)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    got = 0
    while got < n:
        c = sock.recv(n - got)
        if not c:
            raise ConnectionError("socket closed mid-frame")
        chunks.append(c)
        got += len(c)
    return b"".join(chunks)


class KafkaWireClient:
    """Minimal synchronous client over one TCP connection.

    Covers the reference's four broker interactions: topic/partition
    discovery (AvroProducer.java:63-66 describeTopics), cold-start seek
    (AvroConsumer.java:66 earliest), the bounded poll loop
    (AvroConsumer.java:116-138), and the send path
    (AvroProducer.java:83-90) — each as one protocol round-trip.
    """

    def __init__(self, bootstrap: str, *, client_id: str = "pyspark-wire",
                 timeout_s: float = 10.0) -> None:
        host, port = bootstrap.rsplit(":", 1)
        self._sock = socket.create_connection((host, int(port)), timeout=timeout_s)
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "KafkaWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _call(self, api_key: int, api_version: int, body: bytes) -> ByteReader:
        self._corr += 1
        self._sock.sendall(
            encode_request(api_key, api_version, self._corr, self._client_id, body)
        )
        resp = ByteReader(read_frame(self._sock))
        corr = resp.int32()
        if corr != self._corr:
            raise ValueError(f"correlation id mismatch: {corr} != {self._corr}")
        return resp

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._call(API_VERSIONS, 0, b"")
        err = r.int16()
        if err != ERR_NONE:
            raise RuntimeError(f"ApiVersions error {err}")
        rows = r.array(lambda b: (b.int16(), b.int16(), b.int16()))
        return {k: (lo, hi) for k, lo, hi in rows}

    def metadata(self, topics: list[str] | None = None):
        """→ (brokers {node_id: (host, port)}, topics {name: [partition]})."""
        body = ByteWriter().array(topics, lambda w, t: w.string(t)).build()
        r = self._call(API_METADATA, 0, body)
        brokers = {
            node: (host, port)
            for node, host, port in r.array(
                lambda b: (b.int32(), b.string(), b.int32())
            )
        }

        def _partition(b: ByteReader):
            err, pid, leader = b.int16(), b.int32(), b.int32()
            b.array(lambda x: x.int32())  # replicas
            b.array(lambda x: x.int32())  # isr
            return err, pid, leader

        def _topic(b: ByteReader):
            err, name = b.int16(), b.string()
            parts = b.array(_partition)
            return err, name, parts

        topic_map: dict[str, list[int]] = {}
        for err, name, parts in r.array(_topic):
            if err != ERR_NONE:
                raise KeyError(f"topic {name!r}: error {err}")
            topic_map[name] = sorted(p[1] for p in parts)
        return brokers, topic_map

    def list_offsets(self, topic: str, partition: int, timestamp: int) -> int:
        """EARLIEST (-2) → log start, LATEST (-1) → high watermark."""
        body = (
            ByteWriter()
            .int32(-1)  # replica_id: ordinary consumer
            .array(
                [(topic, [(partition, timestamp)])],
                lambda w, t: w.string(t[0]).array(
                    t[1], lambda w2, p: w2.int32(p[0]).int64(p[1])
                ),
            )
            .build()
        )
        r = self._call(API_LIST_OFFSETS, 1, body)

        def _part(b: ByteReader):
            pid, err, ts, off = b.int32(), b.int16(), b.int64(), b.int64()
            return pid, err, ts, off

        topics = r.array(lambda b: (b.string(), b.array(_part)))
        _, parts = topics[0]
        pid, err, _, off = parts[0]
        if err != ERR_NONE:
            raise RuntimeError(f"ListOffsets {topic}[{pid}]: error {err}")
        return off

    def fetch(self, topic: str, partition: int, offset: int,
              *, max_bytes: int = 1 << 20, max_wait_ms: int = 100,
              min_bytes: int = 1) -> tuple[int, list[WireRecord]]:
        """One poll: → (high_watermark, records from ``offset``). An empty
        record list with high_watermark == offset means caught-up — the
        loop condition of the reference's AvroConsumer.java:116-138."""
        body = (
            ByteWriter()
            .int32(-1)
            .int32(max_wait_ms)
            .int32(min_bytes)
            .array(
                [(topic, [(partition, offset, max_bytes)])],
                lambda w, t: w.string(t[0]).array(
                    t[1],
                    lambda w2, p: w2.int32(p[0]).int64(p[1]).int32(p[2]),
                ),
            )
            .build()
        )
        r = self._call(API_FETCH, 2, body)
        r.int32()  # throttle_time_ms

        def _part(b: ByteReader):
            pid, err, hw = b.int32(), b.int16(), b.int64()
            record_set = b.bytes_() or b""
            return pid, err, hw, record_set

        topics = r.array(lambda b: (b.string(), b.array(_part)))
        _, parts = topics[0]
        pid, err, hw, record_set = parts[0]
        if err != ERR_NONE:
            raise RuntimeError(f"Fetch {topic}[{pid}] at {offset}: error {err}")
        records = [rec for rec in decode_message_set(record_set)
                   if rec.offset >= offset]
        return hw, records

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None, int]],
                *, acks: int = -1, timeout_ms: int = 10_000) -> int:
        """Append [(key, value, timestamp_ms)] → base offset assigned."""
        record_set = encode_message_set(records)
        body = (
            ByteWriter()
            .int16(acks)
            .int32(timeout_ms)
            .array(
                [(topic, [(partition, record_set)])],
                lambda w, t: w.string(t[0]).array(
                    t[1], lambda w2, p: w2.int32(p[0]).bytes_(p[1])
                ),
            )
            .build()
        )
        r = self._call(API_PRODUCE, 2, body)

        def _part(b: ByteReader):
            pid, err, base, ts = b.int32(), b.int16(), b.int64(), b.int64()
            return pid, err, base, ts

        topics = r.array(lambda b: (b.string(), b.array(_part)))
        _, parts = topics[0]
        pid, err, base, _ = parts[0]
        if err != ERR_NONE:
            raise RuntimeError(f"Produce {topic}[{pid}]: error {err}")
        return base
