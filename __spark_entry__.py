"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H Q3-style shipping priority) at
sf0.001; ``queries``/``oracle_sql`` expose the engine's full catalog from
``kafka_avro_pipeline_java_spark.plans`` for the DuckDB-oracle harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_avro_pipeline_java_spark.plans import ORACLES, QUERIES
from kafka_avro_pipeline_java_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
