"""Bucketed co-located join: the join must plan with NO shuffle exchange."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.bucketing import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)
from kafka_avro_pipeline_java_spark.sources import load_table


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — managed tables land in ./spark-warehouse
    # (gitignored); tables are dropped in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(o, "orders_b", "o_orderkey", n_buckets=8)
        write_bucketed(l, "lineitem_b", "o_orderkey", n_buckets=8)

        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        agg = joined.groupBy("o_orderkey").agg(F.count("*").alias("n"))
        agg.collect()  # materialize so executedPlan is final (post-AQE)
        assert not plan_has_exchange(joined), (
            "bucketed join should not shuffle:\n"
            + joined._jdf.queryExecution().executedPlan().toString()[:2000]
        )
        # the groupBy on the bucket key is ALSO exchange-free (bucketing
        # satisfies the aggregation's required distribution)
        assert not plan_has_exchange(agg)

        # correctness vs plain join
        plain = (
            o.join(l, "o_orderkey").groupBy("o_orderkey").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
