"""Data-layout utilities: partitioned writes, compaction, sorted layout.

At 100 TB the scan cost is dominated by what you can SKIP. These helpers
produce layouts Catalyst exploits automatically:

- ``write_partitioned``: hive-style directory partitioning → partition
  pruning (`PartitionFilters` in the plan, zero IO for pruned values);
- ``write_sorted_by``: range-repartition + in-file sort → tight parquet
  min/max column statistics → row-group skipping on range predicates;
- ``compact``: rewrite small files into ~uniform target sizes (the
  perpetual maintenance job of any streaming-ingest table — streaming
  sinks write a file per partition per batch).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted_by(df: DataFrame, path: str, sort_col: str, *,
                    num_files: int | None = None, mode: str = "overwrite") -> None:
    """Range-partition on ``sort_col`` then sort within partitions: files
    hold disjoint sorted ranges, so parquet min/max stats prune row groups
    for any range predicate on that column."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact(spark: SparkSession, path: str, out_path: str, *,
            target_file_mb: int = 128) -> int:
    """Rewrite a (typically many-small-files) dataset into files of
    roughly ``target_file_mb``. Returns the file count written."""
    df = spark.read.parquet(path)
    total_bytes = sum(
        f.getLen()
        for f in _list_files(spark, path)
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def _list_files(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    out = []
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            out.append(f)
    return out
