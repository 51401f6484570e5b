"""UDF/UDAF/UDTF extension-point examples work end-to-end."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.functions.udtf_examples import (
    NGramExpander,
    grouped_median,
    squared_relu,
)
from kafka_avro_pipeline_java_spark.sources import load_table


def test_pandas_scalar_udf(spark):
    df = spark.createDataFrame([(-2.0,), (3.0,)], "x double")
    got = {r["x"]: r["y"] for r in df.select("x", squared_relu("x").alias("y")).collect()}
    assert got == {-2.0: 0.0, 3.0: 9.0}


def test_grouped_median_udaf(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").limit(500)
    got = {r["o_custkey"]: r["median_value"]
           for r in grouped_median(o, "o_custkey", "o_totalprice").collect()}
    # spot-check one group against a driver-side computation
    import statistics
    rows = o.select("o_custkey", "o_totalprice").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["o_custkey"], []).append(r["o_totalprice"])
    k = next(iter(by_key))
    assert got[k] == pytest.approx(statistics.median(by_key[k]))


def test_ngram_udtf(spark):
    spark.udtf.register("ngrams", NGramExpander)
    rows = spark.sql(
        "SELECT t.ngram, t.position FROM ngrams('spark', 3) AS t ORDER BY t.position"
    ).collect()
    assert [(r["ngram"], r["position"]) for r in rows] == [
        ("spa", 0), ("par", 1), ("ark", 2)]
