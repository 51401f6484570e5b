"""Constraint operators (operators/constraints.py): planted violations
are counted exactly, clean data reports zero."""

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators import constraints as C


def test_unique_violations_counts_extras(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    assert C.unique_violations(df, ["k"]).collect()[0].n == 1 + 2
    clean = spark.range(10).select(F.col("id").alias("k"))
    assert C.unique_violations(clean, ["k"]).collect()[0].n == 0


def test_foreign_key_violations(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame([(1,), (2,), (2,), (9,), (7,)], "fk long")
    out = C.foreign_key_violations(child, "fk", parent, "pk").collect()[0]
    assert out.n == 2  # 9 and 7


def test_predicate_and_null_rules_share_one_scan(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)],
        "k int, v double",
    )
    row = df.agg(
        C.violations_not_null(df, "k").alias("nn"),
        C.violations_predicate(df, F.col("v") > 0).alias("pos"),
    ).collect()[0]
    assert row.nn == 1
    # deequ/dbt semantics: v > 0 fails for -5.0 AND for the NULL row — an
    # unprovable invariant is a violation (WHEN pred THEN 0 ELSE 1, not
    # sum(NOT pred) which would skip the NULL)
    assert row.pos == 2
    plan = df.agg(C.violations_not_null(df, "k"))._jdf.queryExecution()
    assert plan is not None


def test_predicate_null_rows_count_as_violations(spark):
    df = spark.createDataFrame([(None,), (None,), (5.0,)], "v double")
    row = df.agg(
        C.violations_predicate(df, F.col("v") > 0).alias("n")
    ).collect()[0]
    assert row.n == 2
    clean = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert (
        clean.agg(C.violations_predicate(clean, F.col("v") > 0).alias("n"))
        .collect()[0]
        .n
        == 0
    )
