"""Avro binary codec + Confluent framing tests.

Scalar encodings are checked against hand-computed Avro spec examples
(zigzag varints), then DataFrame-level round-trips via mapInPandas.
"""

import math

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.sources import schema_dsl as S
from kafka_avro_pipeline_java_spark.streaming import avro_codec as C

SCHEMA = S.dsl_to_avro(
    [{"name": "dataset1", "fields": {"key_field1": "string", "timestamp_field1": "long",
                                     "double_field1": "double", "string_field1": "string"}}]
)[0]
FT = [(f["name"], f["type"]) for f in SCHEMA["fields"]]


def test_zigzag_spec_examples():
    # Avro spec: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert C._zigzag_encode(0) == b"\x00"
    assert C._zigzag_encode(-1) == b"\x01"
    assert C._zigzag_encode(1) == b"\x02"
    assert C._zigzag_encode(-64) == b"\x7f"
    assert C._zigzag_encode(64) == b"\x80\x01"


def test_record_roundtrip_scalars():
    vals = ["k1", 1704067200123, 0.123456, "abcDEF"]
    body = C.encode_record(FT, vals)
    out = C.decode_record(FT, body)
    assert out == vals


def test_record_rejects_null():
    with pytest.raises(ValueError, match="null"):
        C.encode_record(FT, ["k1", None, 0.5, "x"])


def test_confluent_framing():
    body = C.encode_record(FT, ["k", 1, 0.5, "v"])
    framed = C.frame_confluent(body, schema_id=7)
    assert framed[0] == 0 and framed[1:5] == b"\x00\x00\x00\x07"
    sid, out = C.unframe_confluent(framed)
    assert sid == 7 and out == body
    with pytest.raises(ValueError, match="magic"):
        C.unframe_confluent(b"\x01junk")


def test_float_int_boolean_scalars():
    ft = [("a", "int"), ("b", "float"), ("c", "boolean")]
    body = C.encode_record(ft, [100, 0.25, True])
    a, b, c = C.decode_record(ft, body)
    assert a == 100 and math.isclose(b, 0.25) and c is True


def test_dataframe_roundtrip(spark):
    rows = [("k1", 10, 0.5, "aa"), ("k2", 20, 0.25, "bb"), ("k3", 30, 0.75, "cc")]
    df = spark.createDataFrame(
        rows, schema="key_field1 string, timestamp_field1 long, "
                     "double_field1 double, string_field1 string")
    framed = C.encode_df(df, SCHEMA, schema_id=3)
    assert framed.columns == ["key", "value"]
    decoded = C.decode_df(framed, SCHEMA)
    assert sorted(map(tuple, decoded.collect())) == sorted(rows)
    # key is Confluent-framed Avro string of field 0
    first = framed.orderBy("key").first()
    sid, body = C.unframe_confluent(bytes(first["key"]))
    assert sid == 3
    import io
    assert C._decode_value(io.BytesIO(body), "string") in ("k1", "k2", "k3")


def test_dataframe_passthrough_partition(spark):
    df = spark.createDataFrame(
        [("k1", 1, 0.5, "x")],
        schema="key_field1 string, timestamp_field1 long, "
               "double_field1 double, string_field1 string")
    from kafka_avro_pipeline_java_spark.streaming.kafka_io import prepare_kafka_batch

    out = prepare_kafka_batch(df, SCHEMA, explicit_partitions=3)
    row = out.first()
    assert set(out.columns) == {"key", "value", "partition"}
    assert 0 <= row["partition"] < 3


def test_multi_schema_version_decode(spark):
    """Schema evolution on one topic: v1 (3 fields) and v2 (adds a field)
    interleaved; decode dispatches on the Confluent schema id and yields
    the union shape with nulls for missing v1 fields."""
    v1 = {"name": "d", "fields": [{"name": "k", "type": "string"},
                                  {"name": "ts", "type": "long"},
                                  {"name": "x", "type": "double"}]}
    v2 = {"name": "d", "fields": [{"name": "k", "type": "string"},
                                  {"name": "ts", "type": "long"},
                                  {"name": "x", "type": "double"},
                                  {"name": "note", "type": "string"}]}
    f1 = [(f["name"], f["type"]) for f in v1["fields"]]
    f2 = [(f["name"], f["type"]) for f in v2["fields"]]
    payloads = [
        (C.frame_confluent(C.encode_record(f1, ["a", 1, 0.5]), 1),),
        (C.frame_confluent(C.encode_record(f2, ["b", 2, 0.25, "hello"]), 2),),
    ]
    df = spark.createDataFrame(payloads, "value binary")
    out = C.decode_df_multi(df, {1: v1, 2: v2})
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["note"] is None and rows["a"]["x"] == 0.5
    assert rows["b"]["note"] == "hello" and rows["b"]["ts"] == 2

    bad = spark.createDataFrame(
        [(C.frame_confluent(C.encode_record(f1, ["c", 3, 0.1]), 99),)], "value binary"
    )
    with pytest.raises(Exception, match="unknown schema id|PythonException"):
        C.decode_df_multi(bad, {1: v1, 2: v2}).collect()


def test_jvm_probe_is_safe(spark):
    # container has no spark-avro jar: probe must return False, not raise
    assert C.jvm_avro_available(spark) in (True, False)


def test_decode_df_passthrough_collision_raises(spark):
    """ADVICE r05: a passthrough column named like a decoded Avro field
    would silently overwrite the decoded values — must raise instead."""
    import pytest

    df = spark.createDataFrame(
        [("k1", 1, 0.5, "x")],
        schema="key_field1 string, timestamp_field1 long, "
               "double_field1 double, string_field1 string")
    framed = C.encode_df(df, SCHEMA, schema_id=1).withColumn(
        "key_field1", F.lit("meta")
    )
    with pytest.raises(ValueError, match="collide.*key_field1"):
        C.decode_df(framed, SCHEMA, passthrough_cols=["key_field1"])
