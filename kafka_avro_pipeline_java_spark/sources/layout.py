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


def _scaled(col, vmin, vmax, bits: int):
    # min-max scale into [0, 2^bits): identical double arithmetic on any
    # engine (one projection; vmin/vmax come from a 1-row broadcast agg)
    span = (vmax - vmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - vmin) / span).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * ((1 << bits) - 1)).cast("long"), F.lit((1 << bits) - 1)
    )


def morton_code(x, y, *, bits: int = 16):
    """Z-order (Morton) interleave of two ``bits``-wide scaled ints: bit i
    of x lands at position 2i, bit i of y at 2i+1. Pure integer bit
    arithmetic (dynamic shifts), disjoint bits → the sum IS the OR, so an
    engine without bitwise-or-in-aggregate reproduces it with SUM."""
    def term(i):
        xi = F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1).cast("long")), 2 * i
        )
        yi = F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
        )
        return xi + yi

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + term(i)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order curve over (col_x, col_y):
    range-repartition + sort by the Morton code so EVERY file covers a
    small rectangle of the 2-D space — parquet min/max stats then prune
    range predicates on EITHER column (a single-column sort only prunes
    its own column). The curve code is computed from a broadcast 1-row
    min/max agg; nothing corpus-sized moves except the one range
    exchange any sorted write needs."""
    stats = df.agg(
        F.min(col_x).alias("xmin"), F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"), F.max(col_y).alias("ymax"),
    )
    with_z = df.crossJoin(F.broadcast(stats)).withColumn(
        "_z",
        morton_code(
            _scaled(F.col(col_x), F.col("xmin"), F.col("xmax"), bits),
            _scaled(F.col(col_y), F.col("ymin"), F.col("ymax"), bits),
            bits=bits,
        ),
    )
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "xmin", "xmax", "ymin", "ymax")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_code_levels(
    df: DataFrame, x: str, y: str, out: str = "hcode", *, bits: int = 8
) -> DataFrame:
    """Hilbert curve index d = xy2d(x, y) over a 2^bits x 2^bits grid —
    the space-filling curve with strictly better locality than Z-order
    (every unit step of d moves to a grid-ADJACENT cell, so curve-ordered
    files get tighter bounding boxes; Morton codes jump at quadrant
    seams). Classic bit-level loop: per level s = 2^i, the quadrant pair
    (rx, ry) contributes s^2 * gray(rx, ry) to d, then the quadrant frame
    is reflected/swapped so lower bits are read in the rotated frame.

    Each level is materialized as its OWN projection (aliased x/y/d
    columns) rather than one nested column tree: the per-level CASE
    expressions reference the previous level's x and y three times each,
    so a single expression tree would grow ~4^bits nodes (the
    CollapseProject duplication class measured in r11 — SCALE.md); as
    multi-use non-cheap aliases they also stay un-collapsed in the
    optimized plan. Pure integer bit arithmetic per row, no shuffle."""
    n = 1 << bits
    keep = [c for c in df.columns if c not in (x, y)]
    one = F.lit(1).cast("long")
    cur = df.withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col(x), i).bitwiseAND(one)
        ry = F.shiftright(F.col(y), i).bitwiseAND(one)
        d_next = F.col(out) + F.lit(s * s).cast("long") * (
            (F.lit(3).cast("long") * rx).bitwiseXOR(ry)
        )
        nx = (
            F.when(ry == 1, F.col(x))
            .when(rx == 1, F.lit(n - 1).cast("long") - F.col(y))
            .otherwise(F.col(y))
        )
        ny = (
            F.when(ry == 1, F.col(y))
            .when(rx == 1, F.lit(n - 1).cast("long") - F.col(x))
            .otherwise(F.col(x))
        )
        cur = cur.select(*keep, d_next.alias(out), nx.alias(x), ny.alias(y))
    return cur.select(*keep, out)
