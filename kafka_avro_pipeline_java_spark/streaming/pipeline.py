"""End-to-end pipeline assembly (reference §3: infra → produce → consume).

``produce_*`` generates seeded records and lands Confluent-framed Avro
(key,value) pairs in Kafka — or, where no broker exists (this container),
in a spooling directory consumed by Spark's file streaming source. The file
variant exercises the identical query graph: binary (key,value) frames →
``decode_df`` → ``foreachBatch`` exactly-once sink + checkpoint recovery.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..generate import generate_dataset
from .avro_codec import decode_df, encode_df
from .sink import exactly_once_parquet_sink


def produce_to_dir(
    spark: SparkSession,
    avro_schema: dict[str, Any],
    n_rows: int,
    spool_dir: str,
    *,
    seed: int = 42,
    schema_id: int = 1,
) -> None:
    """Generate + Avro-encode records into a spool dir (stand-in for a
    Kafka topic: one parquet file batch ≈ one producer run)."""
    rows = generate_dataset(spark, avro_schema, n_rows, seed=seed)
    framed = encode_df(rows, avro_schema, schema_id=schema_id)
    framed.write.mode("append").parquet(spool_dir)


def consume_from_dir(
    spark: SparkSession,
    spool_dir: str,
    avro_schema: dict[str, Any],
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source streaming consume: decode frames, write exactly-once.

    ``availableNow`` processes everything currently spooled then stops —
    the batch-bounded analog of the reference's poll loop; restart with the
    same checkpoint resumes from recorded progress (the reference's
    read-offsets-and-seek, MySQLProcessData.java:42-63, for free).
    """
    raw = (
        spark.readStream.schema("key binary, value binary")
        .parquet(spool_dir)
    )
    typed = decode_df(raw, avro_schema)
    query = (
        typed.writeStream.foreachBatch(exactly_once_parquet_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query


def read_sink_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed batches of an exactly_once_parquet_sink output."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch_id=*")
    )
