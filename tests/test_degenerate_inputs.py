"""Degenerate-input battery: operators must handle empty and 1-row inputs
without crashing and with sensible results — the edge cases a 100 TB
pipeline hits on an empty partition, a brand-new feed, or a filter that
matched nothing."""

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_sketches_on_empty_and_singleton(spark):
    from kafka_avro_pipeline_java_spark.operators import sketches

    empty = _empty(spark, "g string, u string")
    assert sketches.kmv_distinct(empty, "g", "u").count() == 0
    assert sketches.hll_distinct(empty, "g", "u").count() == 0
    one = spark.createDataFrame([("g", "x")], "g string, u string")
    assert sketches.kmv_distinct(one, "g", "u").collect()[0].est_distinct == 1.0
    # countmin with an empty item stream: every probe reports 0
    probes = spark.createDataFrame([("a",), ("b",)], "tok string")
    out = {
        r.probe: r.est_count
        for r in sketches.countmin_estimate(
            _empty(spark, "tok string"), "tok", probes, "tok"
        ).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_graph_ops_on_empty_edge_lists(spark):
    from kafka_avro_pipeline_java_spark.operators.graph import (
        degree_stats,
        k_core,
        k_core_rounds,
        triangle_count,
        triangle_count_sampled,
    )

    empty = _empty(spark, "id_a long, id_b long")
    assert triangle_count(empty).collect()[0].n_triangles == 0
    row = triangle_count_sampled(empty).collect()[0]
    assert (row.n_closed, row.est_triangles) == (0, 0)
    assert degree_stats(empty, src="id_a", dst="id_b").count() == 0
    assert k_core(empty, 3).count() == 0
    assert k_core_rounds(empty, 3, 2).count() == 0
    # single edge: both endpoints peel at k=2, survive at k=1
    one = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert k_core(one, 2).count() == 0
    assert {r.node for r in k_core(one, 1).collect()} == {1, 2}


def test_scd2_with_empty_update_batch_is_identity(spark):
    from kafka_avro_pipeline_java_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", 0, None), (2, "B", 0, 1), (2, "C", 1, None)],
        "k long, seg string, valid_from int, valid_to int",
    )
    out = scd2_apply(
        dim, _empty(spark, "k long, seg string"), "k", ["seg"], new_version=9
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in dim.collect()}


def test_bm25_with_no_matching_terms_returns_empty(spark):
    from kafka_avro_pipeline_java_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = bm25_topk(spark, docs, "text", "doc_id", ["zzz", "qqq"], k=5)
    assert out.count() == 0


def test_sq8_on_singleton_is_all_zero_codes(spark):
    from kafka_avro_pipeline_java_spark.operators.pq import sq8_encode

    one = spark.createDataFrame(
        [(0, [1.5, -2.0, 3.25])], "vid long, emb array<double>"
    )
    codes = sq8_encode(one, "emb", "vid").collect()[0].codes
    # every dim has lo == hi -> span 0 -> code 0 by the constant-dim rule
    assert codes == [0, 0, 0]


def test_dedup_exact_on_empty_corpus(spark):
    from kafka_avro_pipeline_java_spark.operators import dedup

    empty = _empty(spark, "doc_id long, text string")
    assert dedup.exact_dedup(empty, "text", "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(empty, "text", "doc_id").count() == 0


def test_interval_join_with_one_empty_side(spark):
    import datetime

    from kafka_avro_pipeline_java_spark.streaming import joins as J

    clk = spark.createDataFrame(
        [(1, 10, datetime.datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    pur = _empty(spark, "event_id long, user_id long, ts timestamp")
    assert J.stream_stream_within(clk, pur, "user_id").count() == 0


def test_pointer_jump_all_roots_no_edges(spark):
    from kafka_avro_pipeline_java_spark.operators.hierarchy import pointer_jump

    edges = _empty(spark, "node long, par long")
    roots = spark.createDataFrame([(1,), (2,)], ["node"])
    got = {r["node"]: (r["root"], r["depth"]) for r in
           pointer_jump(edges, roots).collect()}
    assert got == {1: (1, 0), 2: (2, 0)}


def test_transitive_closure_empty_edges(spark):
    from kafka_avro_pipeline_java_spark.operators.hierarchy import (
        transitive_closure,
    )

    empty = _empty(spark, "node long, par long")
    assert transitive_closure(empty).count() == 0


def test_pointer_jump_single_edge(spark):
    from kafka_avro_pipeline_java_spark.operators.hierarchy import pointer_jump

    edges = spark.createDataFrame([(5, 0)], ["node", "par"])
    roots = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: (r["root"], r["depth"], r) for r in
           pointer_jump(edges, roots).collect()}
    assert got[5][:2] == (0, 1)


def test_conversion_latency_quartiles_no_conversions(spark, tmp_path):
    """With zero converting users the query must still emit the oracle's
    single (0, NULL, NULL, NULL) row — the global-agg + crossJoin shape
    pins this (a groupBy over the empty picks set returned zero rows
    before the r10-advice fix)."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    rows = [(u, "click", u, u * 1000) for u in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ts_us long"
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = QUERIES["events_conversion_latency_quartiles"](
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_converting_users"] == 0
    assert r["q1_s"] is None and r["median_s"] is None and r["q3_s"] is None
