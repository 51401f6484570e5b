"""Schema translation: custom JSON DSL ↔ Avro record schema ↔ Spark
StructType ↔ SQL DDL.

Re-expresses the reference's schema pipeline (SURVEY.md §1.2):
- the DSL is an array of ``{"name": ..., "fields": {field: type}}`` objects
  with type names ``string|integer|long|double`` (reference
  ``schema/schema_before.json:1-29``);
- Avro translation wraps fields into a record with namespace ``com.exam``
  and renames ``integer → int`` (reference
  ``01-infra/src/main/java/com/exam/worker/DataPipeline.java:28-78,50``);
- SQL DDL maps Avro types per the switch at ``DataPipeline.java:178-199``.

Deliberate fix vs the reference: unknown types RAISE here. The reference's
DDL generator silently emits nothing for unknown Avro types
(``DataPipeline.java:197-198`` default no-op) — a bug we do not copy.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AVRO_NAMESPACE = "com.exam"

# DSL type → Avro type (DataPipeline.java:50 renames integer→int)
DSL_TO_AVRO = {"string": "string", "integer": "int", "long": "long", "double": "double",
               "float": "float", "boolean": "boolean"}

# Avro type → (Spark type, SQL column type per DataPipeline.java:178-199)
AVRO_TO_SPARK: dict[str, DataType] = {
    "string": StringType(),
    "int": IntegerType(),
    "long": LongType(),
    "double": DoubleType(),
    "float": FloatType(),
    "boolean": BooleanType(),
}
AVRO_TO_SQL = {
    "string": "VARCHAR(255)",
    "int": "INT",
    "long": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
}
SPARK_TO_AVRO = {
    "string": "string",
    "int": "int",
    "bigint": "long",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
}


class UnknownTypeError(ValueError):
    """A DSL/Avro type with no mapping — raised instead of guessing
    (reference DataPipeline.java throws on unknown column types too)."""


def dsl_to_avro(dsl: list[dict[str, Any]] | str) -> list[dict[str, Any]]:
    """Translate the custom JSON DSL into Avro record schemas (as dicts).

    Field order follows the DSL object's own iteration order — the Kafka
    message key is field 0 of the record (reference AvroProducer.java:81),
    so order is semantic and must be preserved exactly.
    """
    if isinstance(dsl, str):
        dsl = json.loads(dsl)
    schemas = []
    for entry in dsl:
        fields = []
        for fname, ftype in entry["fields"].items():
            if ftype not in DSL_TO_AVRO:
                raise UnknownTypeError(f"unsupported DSL type {ftype!r} for field {fname!r}")
            fields.append({"name": fname, "type": DSL_TO_AVRO[ftype]})
        schemas.append(
            {
                "type": "record",
                "namespace": AVRO_NAMESPACE,
                "name": entry["name"],
                "fields": fields,
            }
        )
    return schemas


def avro_to_struct(avro_schema: dict[str, Any] | str) -> StructType:
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    fields = []
    for f in avro_schema["fields"]:
        ftype = f["type"]
        if not isinstance(ftype, str) or ftype not in AVRO_TO_SPARK:
            raise UnknownTypeError(
                f"unsupported Avro type {ftype!r} for field {f['name']!r} "
                "(flat primitive records only, per the reference data model)"
            )
        fields.append(StructField(f["name"], AVRO_TO_SPARK[ftype], nullable=True))
    return StructType(fields)


def struct_to_avro(name: str, struct: StructType) -> dict[str, Any]:
    fields = []
    for f in struct.fields:
        simple = f.dataType.simpleString()
        if simple not in SPARK_TO_AVRO:
            raise UnknownTypeError(f"unsupported Spark type {simple!r} for field {f.name!r}")
        fields.append({"name": f.name, "type": SPARK_TO_AVRO[simple]})
    return {"type": "record", "namespace": AVRO_NAMESPACE, "name": name, "fields": fields}


def avro_to_create_table(avro_schema: dict[str, Any] | str, *, if_not_exists: bool = False) -> str:
    """``CREATE TABLE <record name> (...)`` DDL (table = topic = schema name,
    the reference's 1:1:1 mapping, README.md:21)."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    cols = []
    for f in avro_schema["fields"]:
        ftype = f["type"]
        if ftype not in AVRO_TO_SQL:
            raise UnknownTypeError(f"unsupported Avro type {ftype!r} for field {f['name']!r}")
        cols.append(f"{f['name']} {AVRO_TO_SQL[ftype]}")
    exists = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {exists}{avro_schema['name']} ({', '.join(cols)})"


OFFSETS_TABLE_DDL = (
    # parity with DataPipeline.java:152-158 (kafka_offsets state table);
    # Structured Streaming checkpoints subsume it, kept for JDBC mirroring
    "CREATE TABLE IF NOT EXISTS kafka_offsets ("
    "topic VARCHAR(50) NOT NULL, partition INT NOT NULL, "
    "consumer_group VARCHAR(50), offset BIGINT, "
    "PRIMARY KEY (topic, partition, consumer_group))"
)


def load_reference_dsl(path: str) -> list[dict[str, Any]]:
    with open(path) as fh:
        return json.load(fh)
