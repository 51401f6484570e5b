"""attach_global_order_stats must equal the single-partition window's
output exactly — while never planning an unpartitioned WindowExec."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_avro_pipeline_java_spark.operators.ranking import (
    attach_global_order_stats,
)


def _people(spark, n=257):
    # deliberately skewed weights + duplicate sort values (tie-break key
    # must disambiguate), spread over many input partitions
    rows = [(i, (i * 7919) % 23, (i % 13) + 1) for i in range(n)]
    return spark.createDataFrame(
        rows, "id long, v long, w long"
    ).repartition(16)


def _expected(spark, df, k):
    w = Window.orderBy("v", "id")
    return {
        r["id"]: (r["rn"], r["pr"], r["nt"], r["cs"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.percent_rank().over(w).alias("pr"),
            F.ntile(k).over(w).alias("nt"),
            F.sum("w")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("cs"),
        ).collect()
    }


@pytest.mark.parametrize("n,k", [(257, 10), (25, 3), (7, 10), (1, 4)])
def test_matches_single_partition_window(spark, n, k):
    df = _people(spark, n)
    got = {
        r["id"]: (r["rn"], r["pr"], r["nt"], r["cs"])
        for r in attach_global_order_stats(
            df,
            [("v", "asc"), ("id", "asc")],
            row_number="rn",
            percent_rank="pr",
            ntile=(k, "nt"),
            cumsum=("w", "cs"),
            num_partitions=8,
        ).collect()
    }
    assert got == _expected(spark, df, k)


def test_desc_order_and_exact_tiles(spark):
    df = _people(spark, 100)
    got = attach_global_order_stats(
        df,
        [("v", "desc"), ("id", "asc")],
        row_number="rn",
        ntile=(4, "nt"),
        num_partitions=5,
    )
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = {
        r["id"]: (r["rn"], r["nt"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.ntile(4).over(w).alias("nt"),
        ).collect()
    }
    assert {r["id"]: (r["rn"], r["nt"]) for r in got.collect()} == want


def test_no_unpartitioned_window_in_plan(spark):
    df = _people(spark, 64)
    out = attach_global_order_stats(
        df,
        [("v", "asc"), ("id", "asc")],
        row_number="rn",
        ntile=(10, "nt"),
        cumsum=("w", "cs"),
        num_partitions=4,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned window: {line}"


def test_empty_input(spark):
    df = _people(spark, 257).filter(F.col("v") < -1)
    out = attach_global_order_stats(
        df,
        [("v", "asc"), ("id", "asc")],
        row_number="rn",
        percent_rank="pr",
        ntile=(10, "nt"),
        cumsum=("w", "cs"),
        num_partitions=4,
    )
    assert out.count() == 0


def test_gini_plan_has_no_single_partition_window(spark, sf_dir):
    """Verdict r8 gate: the customer-dimension Gini must not plan an
    unpartitioned Window over the entity-scaled aggregate."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    df = QUERIES["agg_gini_customer_spend"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned window: {line}"


def test_cummin_excl_matches_window(spark):
    from pyspark.sql import functions as F  # noqa: F811

    df = _people(spark, 143)
    got = {
        r["id"]: r["bm"]
        for r in attach_global_order_stats(
            df,
            [("v", "desc"), ("id", "asc")],
            cummin_excl=("w", "bm"),
            num_partitions=6,
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r["id"]: r["bm"]
        for r in df.select("id", F.min("w").over(w).alias("bm")).collect()
    }
    assert got == want  # incl. the null for the global first row
