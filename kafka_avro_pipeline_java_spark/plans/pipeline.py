"""Pipeline-parity and multimodal queries.

These surface the reference's ETL behaviors (keyed partitioning, schema-
driven typing — SURVEY.md §2A) and the multimodal binary-column plumbing
as driver-checkable queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import partition_for_key
from ..operators.multimodal import extract_features, text_as_media
from ..sources import load_table
from .registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing end-to-end: text → binary column → Arrow-
    batched mapInPandas feature extractor → typed metadata. The md5/length
    computed in Python batches must equal DuckDB's over the same bytes."""
    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    feats = extract_features(media)
    return feats.select("media_id", "payload_len", "payload_md5")


# Keyed-partition invariant (reference AvroProducer.java:81-83: same key →
# same partition). java_string_hashcode isn't expressible in DuckDB SQL —
# rows-only check here; exactness vs java.lang.String.hashCode is unit-
# tested in tests/test_hashing.py.
@query("pipeline_key_partitions")
def pipeline_key_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(F.col("source").alias("key"),
                     partition_for_key("source", 3).alias("partition"))
    return (
        keyed.groupBy("key")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("partition").alias("n_partitions"),
            F.min("partition").alias("partition"),
        )
    )
