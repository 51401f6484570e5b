"""Schema translation matrix tests (SURVEY.md §1.2)."""

import json

import pytest

from kafka_avro_pipeline_java_spark.sources import schema_dsl as S

REFERENCE_DSL = [
    {"name": "dataset1", "fields": {"key_field1": "string", "timestamp_field1": "long",
                                    "double_field1": "double", "string_field1": "string"}},
    {"name": "dataset2", "fields": {"key_field2": "string", "timestamp_field2": "long",
                                    "string_field2": "string", "integer_field2": "integer"}},
]


def test_dsl_to_avro_type_matrix():
    schemas = S.dsl_to_avro(REFERENCE_DSL)
    assert [s["name"] for s in schemas] == ["dataset1", "dataset2"]
    d1 = {f["name"]: f["type"] for f in schemas[0]["fields"]}
    assert d1 == {"key_field1": "string", "timestamp_field1": "long",
                  "double_field1": "double", "string_field1": "string"}
    # integer → int rename (reference DataPipeline.java:50)
    d2 = {f["name"]: f["type"] for f in schemas[1]["fields"]}
    assert d2["integer_field2"] == "int"
    assert schemas[0]["namespace"] == "com.exam"


def test_field_order_preserved():
    # field 0 is the Kafka key (AvroProducer.java:81) — order is semantic
    schemas = S.dsl_to_avro(REFERENCE_DSL)
    assert schemas[0]["fields"][0]["name"] == "key_field1"


def test_avro_to_struct_roundtrip():
    avro = S.dsl_to_avro(REFERENCE_DSL)[1]
    st = S.avro_to_struct(avro)
    assert [f.dataType.simpleString() for f in st.fields] == [
        "string", "bigint", "string", "int"]
    back = S.struct_to_avro("dataset2", st)
    assert back["fields"] == avro["fields"]


def test_create_table_ddl():
    avro = S.dsl_to_avro(REFERENCE_DSL)[0]
    ddl = S.avro_to_create_table(avro)
    assert ddl == ("CREATE TABLE dataset1 (key_field1 VARCHAR(255), "
                   "timestamp_field1 BIGINT, double_field1 DOUBLE, "
                   "string_field1 VARCHAR(255))")


def test_unknown_type_raises():
    # the reference silently skips unknown types in DDL (DataPipeline.java:
    # 197-198) — we deliberately raise instead
    with pytest.raises(S.UnknownTypeError):
        S.dsl_to_avro([{"name": "x", "fields": {"f": "decimal"}}])
    with pytest.raises(S.UnknownTypeError):
        S.avro_to_create_table({"name": "x", "fields": [{"name": "f", "type": "bytes"}]})


def test_json_string_input():
    schemas = S.dsl_to_avro(json.dumps(REFERENCE_DSL))
    assert len(schemas) == 2
