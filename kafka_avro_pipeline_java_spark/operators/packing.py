"""Sequence packing for pretraining batches — distributed prefix sum.

A naive running-total over the whole corpus is a single-partition window
(Spark literally warns "Moving all data to a single partition"). The
scalable form is the textbook two-phase scan:

1. range-partition by the ordering key and materialize (localCheckpoint so
   both passes see identical partitions);
2. job 1: per-partition weight totals — a tiny N-row collect (scalar
   metadata, like a file listing, not a data path);
3. job 2: per-row running sum WITHIN each partition (parallel windows) +
   the partition's literal starting offset.

Every row's global prefix sum is exact, no partition ever holds more than
its range slice, and the only driver data is one number per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = sum of ``weight_col`` over all rows with
    ``order_col`` strictly BEFORE this row (exclusive prefix sum in
    ``order_col`` order). ``order_col`` must be unique."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        # materialize ONCE: range boundaries come from a sampling pass, so
        # re-executing the exchange in two separate jobs could place rows
        # differently; checkpoint pins the partitioning both jobs read
        .localCheckpoint()
    )
    totals = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid").agg(F.sum(weight_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_map = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = (
        F.coalesce(F.element_at(offset_map, F.col("__pid")), F.lit(0))
        + F.sum(weight_col).over(w)
        - F.col(weight_col)
    )
    return ranged.withColumn(out_col, prefix).drop("__pid")


def sequential_pack(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row to pack ``floor(prefix_sum / budget)`` — sequential
    fixed-budget packing in ``order_col`` order (the streaming-friendly
    packing used for pretraining batch assembly: a row's pack depends only
    on the weights before it)."""
    with_prefix = with_global_prefix_sum(df, order_col, weight_col, "__prefix")
    return with_prefix.withColumn(
        pack_col, F.floor(F.col("__prefix") / budget).cast("int")
    ).drop("__prefix")
