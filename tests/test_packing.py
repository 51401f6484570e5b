"""Distributed prefix-sum / sequence-packing operator tests."""

import random

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.packing import (
    sequential_pack,
    with_global_prefix_sum,
)


def test_prefix_sum_matches_local_scan(spark):
    """Exclusive prefix sums from the two-phase distributed scan must equal
    a local sequential scan, including across partition boundaries."""
    rng = random.Random(11)
    rows = [(i, rng.randint(1, 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: r["prefix_sum"]
        for r in with_global_prefix_sum(df, "id", "w").collect()
    }
    acc = 0
    for i, w in rows:  # already in id order
        assert got[i] == acc, f"id {i}"
        acc += w


def test_prefix_sum_unsorted_input_and_gaps(spark):
    """Order is defined by the order column, not input order; ids may be
    sparse."""
    rows = [(30, 5), (10, 1), (20, 2)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r["id"]: r["prefix_sum"] for r in with_global_prefix_sum(df, "id", "w").collect()}
    assert got == {10: 0, 20: 1, 30: 3}


def test_sequential_pack_properties(spark):
    """pack_id must be floor(prefix/budget): non-decreasing in id order,
    starting at 0, and no pack's START offset may exceed its budget slot."""
    rng = random.Random(7)
    rows = [(i, rng.randint(1, 400)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w long")
    packed = sorted(
        (r["id"], r["w"], r["pack_id"])
        for r in sequential_pack(df, "id", "w", budget=1000).collect()
    )
    acc = 0
    prev_pack = 0
    for i, w, pack in packed:
        assert pack == acc // 1000
        assert pack >= prev_pack
        prev_pack = pack
        acc += w
