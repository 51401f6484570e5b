"""Python DataSource API connector (sources/pydatasource.py): partition
planning, slice coverage, and value determinism."""

from kafka_avro_pipeline_java_spark.sources.pydatasource import (
    HashRangeDataSource,
    HashRangeReader,
    _hash60,
)


def _register(spark):
    try:
        spark.dataSource.register(HashRangeDataSource)
    except Exception:
        pass  # per-session singleton


def test_partitions_cover_range_without_overlap():
    r = HashRangeReader({"n": "10", "parts": "3"})
    slices = [(p.start, p.end) for p in r.partitions()]
    assert slices == [(0, 4), (4, 8), (8, 10)]
    covered = [i for s, e in slices for i in range(s, e)]
    assert covered == list(range(10))
    # more parts than rows: empty tail splits are dropped
    r2 = HashRangeReader({"n": "2", "parts": "8"})
    assert [(p.start, p.end) for p in r2.partitions()] == [(0, 1), (1, 2)]


def test_read_parallelism_and_values(spark):
    _register(spark)
    df = (
        spark.read.format("hashrange")
        .option("n", "100").option("parts", "5").load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {r.id: r.h for r in df.collect()}
    assert set(rows) == set(range(100))
    assert rows[7] == _hash60("7")  # portable md5-derived value


def test_portable_hash_matches_spark_expression(spark):
    from pyspark.sql import functions as F

    from kafka_avro_pipeline_java_spark.functions.hashing import portable_hash64

    _register(spark)
    df = (
        spark.read.format("hashrange")
        .option("n", "50").option("parts", "2").load()
    )
    bad = df.filter(
        portable_hash64(F.col("id").cast("string")) != F.col("h")
    ).count()
    assert bad == 0


def test_streaming_source_advances_offsets_and_is_deterministic(spark, tmp_path):
    import time

    from kafka_avro_pipeline_java_spark.sources.pydatasource import (
        HashTickDataSource,
    )

    try:
        spark.dataSource.register(HashTickDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("hashticks")
        .option("rows_per_batch", "5")
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("hashticks_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) AS n FROM hashticks_t").collect()[0].n
            if n >= 10:
                break
            time.sleep(1)
        assert n >= 10  # at least two micro-batches pulled
    finally:
        q.stop()
    rows = {
        r.id: r.h
        for r in spark.sql("SELECT id, h FROM hashticks_t").collect()
    }
    # contiguous offsets from 0, deterministic payloads
    assert set(rows) == set(range(len(rows)))
    assert rows[3] == _hash60("3")
