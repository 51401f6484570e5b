"""Layout utilities: partition pruning must show in the plan; compaction
must hit the target file count."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.sources import load_table
from kafka_avro_pipeline_java_spark.sources.layout import (
    compact,
    write_partitioned,
    write_sorted_by,
)


def test_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events")
    write_partitioned(e, path, ["event_type"])

    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly the clicks
    assert df.count() == e.filter(F.col("event_type") == "click").count()


def test_sorted_layout_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_sorted")
    o = load_table(spark, sf_dir, "orders")
    write_sorted_by(o, path, "o_orderdate", num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    # range predicate still correct over the re-laid-out data
    lo = F.lit("1996-01-01").cast("timestamp")
    assert (
        back.filter(F.col("o_orderdate") < lo).count()
        == o.filter(F.col("o_orderdate") < lo).count()
    )


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    import os

    frag, out = str(tmp_path / "frag"), str(tmp_path / "compacted")
    o = load_table(spark, sf_dir, "orders")
    o.repartition(40).write.parquet(frag)  # simulate streaming-sink fragmentation
    n_before = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_before >= 40
    n_target = compact(spark, frag, out, target_file_mb=128)
    n_after = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_after == n_target < n_before
    assert spark.read.parquet(out).count() == o.count()


def test_zorder_clusters_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered files must carry TIGHT per-file ranges on BOTH curve
    columns (the pruning surface); a single-column sort leaves the other
    column's per-file range at ~full width."""
    import glob

    import pyarrow.parquet as pq

    from kafka_avro_pipeline_java_spark.sources.layout import (
        write_sorted_by,
        write_zordered,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def avg_span(path, col):
        spans, lo, hi = [], None, None
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is None:
                continue
            spans.append(fmax - fmin)
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        return (sum(spans) / len(spans)) / (hi - lo)

    zp, sp = str(tmp_path / "zord"), str(tmp_path / "bykey")
    write_zordered(o, zp, "o_custkey", "o_totalprice", n_files=16)
    write_sorted_by(o, sp, "o_custkey", num_files=16)

    # single-column sort: custkey tight, totalprice ~full width per file
    assert avg_span(sp, "o_custkey") < 0.2
    assert avg_span(sp, "o_totalprice") > 0.8
    # z-order: BOTH columns substantially narrowed
    assert avg_span(zp, "o_custkey") < 0.5
    assert avg_span(zp, "o_totalprice") < 0.5
