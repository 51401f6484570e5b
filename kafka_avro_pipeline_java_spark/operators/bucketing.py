"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing both
sides bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — the shuffle is paid once at
write time and amortized over every subsequent join. This is the standing
replacement for the reference's "same key → same partition" co-location
invariant (reference AvroProducer.java:82) on the storage layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans SortMergeJoin without Exchange (verify via plan_has_exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
