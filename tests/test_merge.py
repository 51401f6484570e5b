"""SCD2 merge (operators/merge.py): multi-batch history evolution."""

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.merge import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from int, valid_to int"
    )


def test_scd2_two_batches_build_history_chain(spark):
    dim = _dim(spark, [(1, "A", 0, None), (2, "B", 0, None), (3, "C", 0, None)])
    u1 = spark.createDataFrame([(1, "X"), (2, "B")], "k long, seg string")
    v1 = scd2_apply(dim, u1, "k", ["seg"], new_version=1)
    u2 = spark.createDataFrame([(1, "Y")], "k long, seg string")
    v2 = scd2_apply(v1, u2, "k", ["seg"], new_version=2)

    rows = {(r.k, r.seg, r.valid_from, r.valid_to) for r in v2.collect()}
    assert rows == {
        (1, "A", 0, 1),      # closed by batch 1
        (1, "X", 1, 2),      # opened by batch 1, closed by batch 2
        (1, "Y", 2, None),   # current
        (2, "B", 0, None),   # batch-1 no-op (same attrs) — untouched
        (3, "C", 0, None),   # never updated
    }


def test_scd2_inserts_brand_new_keys(spark):
    # a key absent from the dimension is a pure insert: open row at
    # new_version, no closed row, nothing dropped silently
    dim = _dim(spark, [(1, "A", 0, None)])
    u = spark.createDataFrame([(1, "B"), (99, "Z")], "k long, seg string")
    out = scd2_apply(dim, u, "k", ["seg"], new_version=1)
    rows = {(r.k, r.seg, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "A", 0, 1),      # closed
        (1, "B", 1, None),   # updated current
        (99, "Z", 1, None),  # inserted current — previously vanished
    }


def test_scd2_exactly_one_current_row_per_key(spark):
    dim = _dim(spark, [(i, "A", 0, None) for i in range(20)])
    u = spark.createDataFrame(
        [(i, "B") for i in range(0, 20, 2)], "k long, seg string"
    )
    out = scd2_apply(dim, u, "k", ["seg"], new_version=1)
    cur = out.filter(F.col("valid_to").isNull()).groupBy("k").count()
    assert cur.filter(F.col("count") != 1).count() == 0
    assert out.count() == 20 + 10  # 10 closed rows added


def test_scd2_streaming_maintenance_matches_batch(spark, tmp_path):
    """SCD2 as a STREAMING sink: CDC batches arriving as files are applied
    to the dimension in foreachBatch (one scd2_apply per micro-batch,
    version = batch ordinal) and the final history must equal applying
    the same batches sequentially in batch mode — the warehouse family's
    streaming<->batch parity, same discipline as the window/funnel/HLL
    twins."""
    import os

    spool = str(tmp_path / "cdc")
    os.makedirs(spool)
    u1 = spark.createDataFrame([(1, "X"), (2, "B")], "k long, seg string")
    u2 = spark.createDataFrame([(1, "Y"), (9, "Z")], "k long, seg string")
    # two files -> two micro-batches (maxFilesPerTrigger=1); write in order
    u1.coalesce(1).write.parquet(spool + "/b1")
    u2.coalesce(1).write.parquet(spool + "/b2")

    dim0 = _dim(spark, [(1, "A", 0, None), (2, "B", 0, None), (3, "C", 0, None)])
    state = {"dim": dim0, "version": 0}

    def apply_batch(batch_df, batch_id):
        rows = batch_df.collect()
        if not rows:
            return
        state["version"] += 1
        updates = spark.createDataFrame(rows, batch_df.schema)
        state["dim"] = scd2_apply(
            state["dim"], updates, "k", ["seg"], new_version=state["version"]
        ).localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema("k long, seg string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool + "/b*")
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = scd2_apply(
        scd2_apply(dim0, u1, "k", ["seg"], new_version=1),
        u2, "k", ["seg"], new_version=2,
    )
    got_rows = {tuple(r) for r in state["dim"].collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert state["version"] == 2  # two micro-batches actually happened
    assert got_rows == want_rows


def test_scd2_mixed_version_and_end_types(spark):
    # valid_from int, valid_to timestamp: each NULL/close cast must use its
    # OWN column's type (regression: both casts once used valid_from's)
    dim = spark.createDataFrame(
        [(1, "A", 0, None), (2, "B", 0, None)],
        "k long, seg string, valid_from int, valid_to timestamp",
    )
    u = spark.createDataFrame([(1, "X"), (9, "Z")], "k long, seg string")
    out = scd2_apply(dim, u, "k", ["seg"], new_version=1)
    types = dict(out.dtypes)
    assert types["valid_from"] == "int"
    assert types["valid_to"] == "timestamp"
    # closed row's valid_to is new_version cast to timestamp (epoch second 1)
    closed = out.filter(F.col("k") == 1).filter(F.col("valid_to").isNotNull())
    assert closed.count() == 1
