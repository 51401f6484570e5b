"""The reference's full workload shape, end-to-end (SURVEY.md §3, §5):
3 schemas × 1,500 keyed Avro messages → framed (key,value) pairs with
explicit partition parity → streamed consumption → exactly-once sink —
then the reference's own manual verification queries, automated:

1. per-topic message count == 1,500 (README.md:218-231 invariant);
2. same key → same partition, recomputed consumer-side
   (AvroConsumer.java:123-124);
3. all rows land typed and intact (SELECT * sanity, README.md:204-214).
"""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.generate import generate_dataset
from kafka_avro_pipeline_java_spark.sources import schema_dsl as S
from kafka_avro_pipeline_java_spark.streaming.avro_codec import decode_df
from kafka_avro_pipeline_java_spark.streaming.kafka_io import prepare_kafka_batch
from kafka_avro_pipeline_java_spark.streaming.pipeline import (
    consume_from_dir,
    read_sink_output,
)
from kafka_avro_pipeline_java_spark.functions.hashing import partition_for_key

DSL = [
    {"name": "dataset1", "fields": {"key_field1": "string", "timestamp_field1": "long",
                                    "double_field1": "double", "string_field1": "string"}},
    {"name": "dataset2", "fields": {"key_field2": "string", "timestamp_field2": "long",
                                    "string_field2": "string", "integer_field2": "integer"}},
    {"name": "dataset3", "fields": {"key_field3": "string", "timestamp_field3": "long",
                                    "string_field3": "string", "long_field3": "long"}},
]
N_PER_TOPIC = 1500  # 5 threads × 300 in the reference producer
N_PARTITIONS = 3


def test_full_reference_topology(spark, tmp_path):
    schemas = S.dsl_to_avro(DSL)
    sink_dirs = {}
    for i, schema in enumerate(schemas):
        topic = schema["name"]
        spool = str(tmp_path / f"spool_{topic}")
        out = str(tmp_path / f"out_{topic}")
        ckpt = str(tmp_path / f"ckpt_{topic}")

        # produce: generate → frame → explicit reference partition column
        rows = generate_dataset(spark, schema, N_PER_TOPIC, seed=42 + i)
        framed = prepare_kafka_batch(rows, schema, explicit_partitions=N_PARTITIONS)
        framed.write.mode("overwrite").parquet(spool)

        # partition column exists and is in range (Kafka would route on it)
        pr = spark.read.parquet(spool)
        assert pr.filter((F.col("partition") < 0) | (F.col("partition") >= N_PARTITIONS)).count() == 0

        # consume: stream → decode → exactly-once sink
        raw_schema = "key binary, value binary, partition int"
        raw = spark.readStream.schema(raw_schema).parquet(spool).drop("partition")
        from kafka_avro_pipeline_java_spark.streaming.sink import exactly_once_parquet_sink

        q = (
            decode_df(raw, schema)
            .writeStream.foreachBatch(exactly_once_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        sink_dirs[topic] = out

    for i, schema in enumerate(schemas):
        topic = schema["name"]
        got = read_sink_output(spark, sink_dirs[topic])
        # 1. count invariant: Σ messages per topic == 1,500
        assert got.count() == N_PER_TOPIC, topic
        # 2. typed landing: every declared field present, non-null
        for f in schema["fields"]:
            assert got.filter(F.col(f["name"]).isNull()).count() == 0
        # 3. keyed-partition invariant recomputed "consumer-side"
        key = schema["fields"][0]["name"]
        bad = (
            got.select(partition_for_key(F.col(key).cast("string"), N_PARTITIONS).alias("p"),
                       F.col(key))
            .groupBy(key)
            .agg(F.countDistinct("p").alias("np"))
            .filter(F.col("np") > 1)
            .count()
        )
        assert bad == 0, topic
