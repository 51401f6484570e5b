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


def test_null_sort_keys_match_window(spark):
    """Nullable sort column: repartitionByRange and WindowExec must agree
    on null placement (both put NULLS FIRST for asc, LAST for desc in
    Spark) — pinned here so helper users can rely on it."""
    rows = [(i, None if i % 7 == 0 else (i * 31) % 11, i % 5 + 1)
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, v long, w long").repartition(9)
    for direction in ("asc", "desc"):
        got = {
            r["id"]: (r["rn"], r["cs"])
            for r in attach_global_order_stats(
                df,
                [("v", direction), ("id", "asc")],
                row_number="rn",
                cumsum=("w", "cs"),
                num_partitions=5,
            ).collect()
        }
        order = (
            [F.col("v").asc(), F.col("id").asc()]
            if direction == "asc"
            else [F.col("v").desc(), F.col("id").asc()]
        )
        w = Window.orderBy(*order)
        want = {
            r["id"]: (r["rn"], r["cs"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("bigint").alias("rn"),
                F.sum("w")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("bigint")
                .alias("cs"),
            ).collect()
        }
        assert got == want, direction


def test_randomized_shapes_match_window(spark):
    """Deterministic pseudo-random sweep over (n, k, partitions, dup
    density) shapes — the property form of the exact-equality tests."""
    state = 12345
    for trial in range(6):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        n = 3 + state % 400
        k = 2 + (state >> 8) % 12
        parts = 1 + (state >> 16) % 10
        mod = 1 + (state >> 24) % 50
        rows = [(i, (i * 2654435761) % mod, (i % 9) + 1) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long, w long")
        got = {
            r["id"]: (r["rn"], r["nt"], r["cs"])
            for r in attach_global_order_stats(
                df,
                [("v", "asc"), ("id", "asc")],
                row_number="rn",
                ntile=(k, "nt"),
                cumsum=("w", "cs"),
                num_partitions=parts,
            ).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            r["id"]: (r["rn"], r["nt"], r["cs"])
            for r in df.select(
                "id",
                F.row_number().over(w).cast("bigint").alias("rn"),
                F.ntile(k).over(w).alias("nt"),
                F.sum("w")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("bigint")
                .alias("cs"),
            ).collect()
        }
        assert got == want, (trial, n, k, parts, mod)
