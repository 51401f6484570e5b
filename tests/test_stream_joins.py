"""Stream-stream / stream-static join tests against batch equivalents."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.sources import load_table
from kafka_avro_pipeline_java_spark.streaming import joins as J

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def spool(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("events_spool_j"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(p)
    return p


def test_stream_stream_click_then_purchase(spark, sf_dir, spool):
    def side(tp):
        return (
            spark.readStream.schema(EVENTS_SCHEMA).parquet(spool)
            .filter(F.col("event_type") == tp)
            .select("event_id", "ts", "user_id", "value")
        )

    joined = J.stream_stream_within(
        side("click"), side("purchase"), key="user_id", within="1 hour",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT l_event_id, r_event_id FROM ssj_t")

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"), F.col("ts").alias("lts"),
        F.col("user_id").alias("u"))
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), F.col("ts").alias("rts"),
        F.col("user_id").alias("u2"))
    want = clicks.join(
        buys,
        (F.col("u") == F.col("u2"))
        & (F.col("rts") > F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 HOUR")),
    ).select("l_event_id", "r_event_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert want.count() > 0, "fixture produced no joinable pairs — test is vacuous"


def test_stream_static_enrich(spark, sf_dir, spool):
    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue"), ("view", "engagement"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(spool)
    q = (
        J.stream_static_enrich(stream, dim, "event_type")
        .writeStream.format("memory").queryName("sse_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT category, COUNT(*) n FROM sse_t GROUP BY category")
    assert got.filter(F.col("category").isNull()).count() == 0
    total = got.agg(F.sum("n")).first()[0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_salted_join_matches_plain(spark, sf_dir):
    from kafka_avro_pipeline_java_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(o.withColumnRenamed("o_custkey", "custkey"),
                    c.withColumnRenamed("c_custkey", "custkey"), "custkey")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
