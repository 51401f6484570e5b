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
