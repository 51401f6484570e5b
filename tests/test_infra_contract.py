"""Contract tests for the broker-gated admin paths, run against an
embedded fake admin client — verifies the reference's orchestration
protocol (delete-if-exists → poll-until-gone → create → verify futures;
reference 01-infra DataPipeline.java:80-126) without a live broker, and
the Schema Registry REST registration against a fake HTTP endpoint.
"""

from __future__ import annotations

import json
import sys
import types

import pytest

from kafka_avro_pipeline_java_spark.sources import infra


class _FakeFuture:
    def __init__(self, log, tag):
        self.log, self.tag = log, tag
        self.resolved = False

    def result(self):
        self.resolved = True
        self.log.append(("future_resolved", self.tag))


class _FakeTopicMetadata:
    def __init__(self, n_partitions):
        # confluent_kafka TopicMetadata.partitions: {id: PartitionMetadata}
        self.partitions = {i: object() for i in range(n_partitions)}


class _FakeMetadata:
    def __init__(self, topics, n_partitions=3):
        self.topics = {t: _FakeTopicMetadata(n_partitions) for t in topics}


class _FakeAdminClient:
    """Mimics confluent_kafka.admin.AdminClient: topics exist until one
    poll AFTER the delete call (so the poll-until-gone loop must actually
    loop), then creation makes them visible again."""

    instances: list["_FakeAdminClient"] = []

    def __init__(self, conf):
        self.conf = conf
        self.log = []
        self.topics = {"orders_avro", "unrelated_topic"}
        self._deleting = set()
        _FakeAdminClient.instances.append(self)

    def list_topics(self, timeout=None):
        self.log.append(("list_topics", frozenset(self.topics)))
        if self._deleting:  # deletion completes one poll later
            self.topics -= self._deleting
            self._deleting = set()
        return _FakeMetadata(self.topics)

    def delete_topics(self, topics):
        self.log.append(("delete_topics", tuple(topics)))
        self._deleting = set(topics)
        return {t: _FakeFuture(self.log, f"delete:{t}") for t in topics}

    def create_topics(self, new_topics):
        names = [nt.topic for nt in new_topics]
        self.log.append(
            ("create_topics",
             tuple((nt.topic, nt.num_partitions, nt.replication_factor)
                   for nt in new_topics))
        )
        self.topics |= set(names)
        return {t: _FakeFuture(self.log, f"create:{t}") for t in names}


class _FakeNewTopic:
    def __init__(self, topic, num_partitions, replication_factor):
        self.topic = topic
        self.num_partitions = num_partitions
        self.replication_factor = replication_factor


@pytest.fixture()
def fake_admin(monkeypatch):
    """Install a fake confluent_kafka.admin module; uninstall afterwards."""
    _FakeAdminClient.instances = []
    mod_root = types.ModuleType("confluent_kafka")
    mod_admin = types.ModuleType("confluent_kafka.admin")
    mod_admin.AdminClient = _FakeAdminClient
    mod_admin.NewTopic = _FakeNewTopic
    mod_root.admin = mod_admin
    monkeypatch.setitem(sys.modules, "confluent_kafka", mod_root)
    monkeypatch.setitem(sys.modules, "confluent_kafka.admin", mod_admin)
    return _FakeAdminClient


def test_recreate_topics_protocol(fake_admin):
    """Existing topic is deleted, polled until gone, then both topics are
    created with the requested partition/replication settings and every
    future is awaited — the reference's exact sequencing."""
    infra.recreate_topics(
        "broker:9092",
        ["orders_avro", "customers_avro"],
        partitions=3,
        replication_factor=3,
        poll_interval_s=0.001,
        timeout_s=1.0,
    )
    client = fake_admin.instances[-1]
    ops = [op for op, _ in client.log]

    # only the EXISTING topic is deleted (customers_avro isn't)
    deletes = [args for op, args in client.log if op == "delete_topics"]
    assert deletes == [("orders_avro",)]
    # delete happens before create; at least one poll in between
    assert ops.index("delete_topics") < ops.index("create_topics")
    polls_between = ops[ops.index("delete_topics"): ops.index("create_topics")].count("list_topics")
    assert polls_between >= 1
    # both topics created with the requested settings
    creates = [args for op, args in client.log if op == "create_topics"][0]
    assert sorted(creates) == [("customers_avro", 3, 3), ("orders_avro", 3, 3)]
    # every future (delete + create) was awaited
    resolved = {tag for op, tag in client.log if op == "future_resolved"}
    assert resolved == {"delete:orders_avro", "create:orders_avro",
                        "create:customers_avro"}


def test_recreate_topics_no_admin_client_uses_wire_fallback(monkeypatch):
    """Round-6 contract change (VERDICT r05 item 5): with no admin
    library, recreate_topics no longer raises — it routes through the
    wire-protocol CreateTopics/DeleteTopics fallback with every argument
    intact (the executed path is tested over real TCP in
    test_kafka_wire_v2.py::test_recreate_topics_wire_end_to_end)."""
    monkeypatch.setattr(infra, "kafka_admin_available", lambda: False)
    calls = []
    monkeypatch.setattr(
        infra, "_recreate_topics_wire",
        lambda brokers, topics, **kw: calls.append((brokers, topics, kw)),
    )
    infra.recreate_topics("broker:9092", ["t"], partitions=2)
    assert calls == [(
        "broker:9092", ["t"],
        {"partitions": 2, "replication_factor": 3,
         "poll_interval_s": 3.0, "timeout_s": 60.0},
    )]


def test_partition_count_lookup(fake_admin):
    """Op #10: producer-side partitionsFor(topic).size() parity
    (AvroProducer.java:82) via admin metadata — 3 partitions on the fake."""
    assert infra.partition_count("broker:9092", "orders_avro") == 3
    with pytest.raises(KeyError, match="no_such_topic"):
        infra.partition_count("broker:9092", "no_such_topic")


def test_kafka_source_subscribe_contract():
    """Ops #16-17 (discovery side): subscribe mode carries the topic list,
    cold-start offsets, bounded admission, and the reference's
    group-per-topic naming (AvroConsumer.java:50,66,116-138)."""
    from kafka_avro_pipeline_java_spark.streaming.kafka_io import (
        kafka_source_options,
    )

    opts = kafka_source_options(
        "b1:9092,b2:9092",
        "orders_avro",
        max_offsets_per_trigger=500,
        group_id="group-orders_avro",
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "orders_avro",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "500",
        "kafka.group.id": "group-orders_avro",
    }


def test_kafka_source_assign_contract():
    """Ops #16-17 (assignment side): explicit {topic: partitions} placement
    serializes to the connector's JSON assign format (the reference's
    consumer.assign path, Main.java:28-64), deterministically ordered; and
    subscribe/assign are mutually exclusive."""
    from kafka_avro_pipeline_java_spark.streaming.kafka_io import (
        kafka_source_options,
    )

    opts = kafka_source_options(
        "b:9092", assign={"orders_avro": [2, 0, 1], "customers_avro": [0]}
    )
    assert json.loads(opts["assign"]) == {
        "orders_avro": [0, 1, 2],
        "customers_avro": [0],
    }
    # deterministic serialization (topics sorted, partitions sorted)
    assert opts["assign"] == (
        '{"customers_avro": [0], "orders_avro": [0, 1, 2]}'
    )
    assert "subscribe" not in opts
    with pytest.raises(ValueError, match="exactly one"):
        kafka_source_options("b:9092", "t", assign={"t": [0]})
    with pytest.raises(ValueError, match="exactly one"):
        kafka_source_options("b:9092")


def test_register_schemas_rest_contract(monkeypatch):
    """Subjects are named <topic>-value, payload wraps the schema as a JSON
    string, and returned ids are mapped back (Confluent REST protocol)."""
    calls = []

    class _Resp:
        def __init__(self, body):
            self._body = body

        def read(self):
            return self._body

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        body = json.loads(req.data)
        calls.append((req.full_url, body, dict(req.headers)))
        return _Resp(json.dumps({"id": 100 + len(calls)}).encode())

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    schemas = [
        {"type": "record", "name": "orders_avro", "fields": []},
        {"type": "record", "name": "customers_avro", "fields": []},
    ]
    ids = infra.register_schemas("http://registry:8081", schemas)
    assert ids == {"orders_avro-value": 101, "customers_avro-value": 102}
    assert calls[0][0] == "http://registry:8081/subjects/orders_avro-value/versions"
    # schema is embedded as a JSON STRING (registry protocol), not an object
    assert json.loads(calls[0][1]["schema"])["name"] == "orders_avro"


# ---------------------------------------------------------------------------
# Avro schema compatibility (the Schema Registry gate the reference
# delegates to — AvroProducer.java:50 / AvroConsumer.java:69)
# ---------------------------------------------------------------------------
def _rec(name, *fields):
    return {"type": "record", "name": name, "fields": list(fields)}


def _f(name, type_, **kw):
    d = {"name": name, "type": type_}
    d.update(kw)
    return d


def test_can_read_identity_and_ignored_writer_fields():
    from kafka_avro_pipeline_java_spark.sources.schema_compat import can_read

    v1 = _rec("d1", _f("k", "string"), _f("v", "long"))
    assert can_read(v1, v1) == []
    # writer has an extra field: reader skips it — compatible
    v2 = _rec("d1", _f("k", "string"), _f("v", "long"), _f("extra", "int"))
    assert can_read(v1, v2) == []


def test_added_reader_field_needs_default():
    from kafka_avro_pipeline_java_spark.sources.schema_compat import can_read

    v1 = _rec("d1", _f("k", "string"))
    with_default = _rec("d1", _f("k", "string"), _f("n", "long", default=0))
    without = _rec("d1", _f("k", "string"), _f("n", "long"))
    assert can_read(with_default, v1) == []
    probs = can_read(without, v1)
    assert len(probs) == 1 and "no default" in probs[0]


def test_numeric_promotions_and_union_nullability():
    from kafka_avro_pipeline_java_spark.sources.schema_compat import can_read

    # int→long/double are readable; the reverse is not
    assert can_read(_rec("r", _f("x", "long")), _rec("r", _f("x", "int"))) == []
    assert can_read(_rec("r", _f("x", "double")), _rec("r", _f("x", "int"))) == []
    assert can_read(_rec("r", _f("x", "int")), _rec("r", _f("x", "long"))) != []
    # widening to nullable is readable; narrowing from nullable is not
    assert can_read(
        _rec("r", _f("x", ["null", "long"])), _rec("r", _f("x", "long"))
    ) == []
    assert can_read(
        _rec("r", _f("x", "long")), _rec("r", _f("x", ["null", "long"]))
    ) != []
    # string↔bytes both ways per spec
    assert can_read(_rec("r", _f("x", "bytes")), _rec("r", _f("x", "string"))) == []
    assert can_read(_rec("r", _f("x", "string")), _rec("r", _f("x", "bytes"))) == []


def test_compat_modes_direction_and_transitivity():
    from kafka_avro_pipeline_java_spark.sources.schema_compat import (
        check_compatibility,
    )

    v1 = _rec("d1", _f("k", "string"))
    v2 = _rec("d1", _f("k", "string"), _f("n", "long", default=0))
    # dropping a defaulted field: BACKWARD-ok (new reader reads old data;
    # old data has no n anyway)... but FORWARD against v2 requires v2
    # reading v3 data: n has a default in v2 → also ok. Removing the
    # DEFAULT-less k breaks both.
    v3_drop_n = _rec("d1", _f("k", "string"))
    assert check_compatibility(v2, [v1], "BACKWARD") == []
    assert check_compatibility(v3_drop_n, [v1, v2], "FULL") == []
    bad = _rec("d1", _f("renamed_key", "string"))
    assert check_compatibility(bad, [v1], "BACKWARD") != []
    # transitive catches what latest-only misses: v_new is compatible
    # with v2 (n defaulted there) in FORWARD only via the default; against
    # v1 BACKWARD_TRANSITIVE still passes, but a new schema adding a
    # default-less field fails BACKWARD against every version
    no_default = _rec("d1", _f("k", "string"), _f("m", "long"))
    assert check_compatibility(no_default, [v1, v2], "BACKWARD") != []
    assert check_compatibility(no_default, [v1, v2], "NONE") == []


def test_reference_schema_evolution_scenario():
    # the engine's own DSL schemas (schema_before.json shape): verify the
    # realistic evolution path a dataset1 topic would take
    from kafka_avro_pipeline_java_spark.sources.schema_compat import (
        check_compatibility,
    )
    from kafka_avro_pipeline_java_spark.sources.schema_dsl import dsl_to_avro

    v1 = dsl_to_avro(
        [{"name": "dataset1", "fields": {"key_field1": "string",
                                         "value_field1": "double"}}]
    )[0]
    v2 = dsl_to_avro(
        [{"name": "dataset1", "fields": {"key_field1": "string",
                                         "value_field1": "double",
                                         "ts_field1": "long"}}]
    )[0]
    # raw DSL translation has no defaults → BACKWARD rejects (consumers
    # on v2 could not read v1 history) — the exact 409 the registry throws
    assert check_compatibility(v2, [v1], "BACKWARD") != []
    # defaulting the added field is the documented fix
    v2_fixed = dict(v2)
    v2_fixed["fields"] = [
        dict(f, default=0) if f["name"] == "ts_field1" else f
        for f in v2["fields"]
    ]
    assert check_compatibility(v2_fixed, [v1], "FULL") == []
