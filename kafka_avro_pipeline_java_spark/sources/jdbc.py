"""JDBC source/sink helpers (the reference's MySQL side, Spark-first).

The reference hand-rolls: dynamic INSERT generation from the record schema
(reference ``MySQLProcessData.java:94-130``), typed parameter binding
(``:132-156``), and a 178-line connection pool
(``MySQLConnectionPool.java``). Spark's JDBC data source subsumes all
three: INSERTs are generated from the DataFrame schema, types map through
the dialect, batching via ``batchsize``, and connection lifecycle is the
writer's. Reading partitions the table by a numeric column so a 10^9-row
table scans in parallel.

No JDBC driver/database exists in this container — helpers raise a clear
error if used without one; logic that can be tested driver-free lives in
``streaming/sink.py`` (DB-API exactly-once sink, tested against sqlite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MYSQL_URL_TEMPLATE = "jdbc:mysql://{host}:{port}/{database}"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel JDBC read. With ``partition_column`` (numeric/date PK),
    Spark issues ``num_partitions`` range-bounded queries — without it the
    whole table arrives through ONE connection (never do that at scale)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict | None = None,
) -> None:
    """Batched JDBC append — replaces the reference's row-at-a-time
    prepared-statement inserts (MySQLProcessData.java:111) with
    ``batchsize``-row batches per partition, written concurrently from
    every executor."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
