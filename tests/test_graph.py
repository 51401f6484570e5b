"""Graph operators (operators/graph.py): mass conservation, hub ranking,
symmetry, and the EWMA recurrence."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.graph import degree_stats, pagerank


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_pagerank_mass_conserved_and_hub_ranked(spark):
    # star: node 0 linked to 1..5 — the hub must outrank every leaf, and
    # total rank stays 1 (symmetrized graph has no dangling mass)
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    ranks = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    assert len(set(round(v, 12) for v in ranks.values())) == 1  # leaves tie


def test_pagerank_ring_is_uniform(spark):
    n = 6
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = [r.rank for r in pagerank(e, iters=4).collect()]
    assert len(ranks) == n
    assert max(ranks) - min(ranks) < 1e-12
    assert abs(sum(ranks) - 1.0) < 1e-9


def test_degree_stats_counts_both_endpoints(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r.degree: r.n_nodes
        for r in degree_stats(pairs, src="id_a", dst="id_b").collect()
    }
    assert got == {2: 1, 1: 4}  # node 1 has degree 2; 2,3,4,5 degree 1


def test_ewma_constant_series_is_constant(spark, sf_dir):
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    out = QUERIES["events_ewma_hourly"](spark, sf_dir)
    # recurrence invariant: every ewma lies within [min(v), max(v)] seen so
    # far per user — check the global bound as a cheap proxy
    row = out.agg(
        F.min(F.col("ewma") - F.col("v")).alias("lo"),
        F.max(F.col("ewma") - F.col("v")).alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.n > 0
    # first point: ewma == v exactly
    first = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy("hour")
            ),
        )
        .filter(F.col("rn") == 1)
        .filter(F.abs(F.col("ewma") - F.col("v")) > 1e-9)
        .count()
    )
    assert first == 0
