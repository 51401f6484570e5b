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


def test_pagerank_directed_keeps_in_edgeless_nodes(spark):
    # plain DIRECTED graph 0→1, 1→2, 2→1: node 0 has out-edges (so it is
    # in the node set) but NO in-edges — it must still appear in the
    # result with exactly its restart mass (1-d)/N, and total mass over
    # the node set must stay 1 (previously 0 silently vanished after the
    # first groupBy(dst) and its mass with it).
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in pagerank(e, iters=4).collect()}
    assert set(ranks) == {0, 1, 2}  # 0 survives despite no in-edges
    assert ranks[0] == pytest.approx((1 - 0.85) / 3)
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no mass lost


def test_eigenvector_directed_keeps_in_edgeless_nodes(spark):
    from kafka_avro_pipeline_java_spark.operators.graph import (
        eigenvector_centrality,
    )

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in eigenvector_centrality(e, iters=3).collect()}
    assert set(ranks) == {0, 1, 2}
    assert ranks[0] == 0.0  # no in-edges → score 0, but the row survives


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


def test_triangle_count_on_planted_cliques(spark):
    from kafka_avro_pipeline_java_spark.operators.graph import triangle_count

    # K4 (4 triangles) + K3 (1) + a path (0) + isolated edge (0)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k3 = [(10, 11), (10, 12), (11, 12)]
    path = [(20, 21), (21, 22)]
    extra = [(30, 31)]
    pairs = spark.createDataFrame(k4 + k3 + path + extra, "id_a long, id_b long")
    got = triangle_count(pairs).collect()[0].n_triangles
    assert got == 4 + 1


def test_triangle_count_matches_naive_on_random_graph(spark):
    import itertools
    import random

    from kafka_avro_pipeline_java_spark.operators.graph import triangle_count

    rng = random.Random(7)
    nodes = range(30)
    pairs = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2
    ]
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in pairs and (b, c) in pairs and (a, c) in pairs)
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    assert triangle_count(df).collect()[0].n_triangles == want


def test_triangle_sampled_unbiased_and_bounded(spark):
    import itertools
    import random

    from kafka_avro_pipeline_java_spark.operators.graph import (
        triangle_count,
        triangle_count_sampled,
    )

    rng = random.Random(11)
    nodes = range(60)
    pairs = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.3
    ]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    exact = triangle_count(df).collect()[0].n_triangles
    est_row = triangle_count_sampled(df, inv_rate=4, seed="tri").collect()[0]
    # p=1/4 edge-leg gating: sqrt((1-p)/(p*T)) is the independent-triangle
    # lower bound on sigma; correlation groups (common neighbors per leg)
    # are ~1 on this sparse random graph, so 5x the bound is a safe band
    sigma = (0.75 / (0.25 * exact)) ** 0.5
    assert est_row.est_triangles == est_row.n_closed * 4
    assert abs(est_row.est_triangles - exact) / exact <= 5 * sigma
    # determinism: the hash gate is a pure function of the graph
    again = triangle_count_sampled(df, inv_rate=4, seed="tri").collect()[0]
    assert again.est_triangles == est_row.est_triangles


def test_triangle_sampled_full_rate_is_exact(spark):
    from kafka_avro_pipeline_java_spark.operators.graph import (
        triangle_count_sampled,
    )

    # inv_rate=1 -> gate threshold 2^60, every wedge edge-leg passes the gate -> exact
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k3 = [(10, 11), (10, 12), (11, 12)]
    pairs = spark.createDataFrame(k4 + k3, "id_a long, id_b long")
    row = triangle_count_sampled(pairs, inv_rate=1).collect()[0]
    assert row.est_triangles == 4 + 1


def test_k_core_matches_python_peeling(spark):
    import itertools
    import random

    from kafka_avro_pipeline_java_spark.operators.graph import k_core

    rng = random.Random(11)
    pairs = [
        (a, b) for a, b in itertools.combinations(range(40), 2)
        if rng.random() < 0.12
    ]

    def py_kcore(edges, k):
        edges = set(edges)
        while True:
            deg = {}
            for a, b in edges:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return deg
            edges = {(a, b) for a, b in edges if a not in bad and b not in bad}

    want = py_kcore(pairs, 3)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r.node: r.degree for r in k_core(df, 3).collect()}
    assert got == want


def test_k_core_of_clique_is_whole_clique(spark):
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pendant = [(0, 99), (99, 98)]  # chain that must peel away at k=3
    df = spark.createDataFrame(k5 + pendant, "id_a long, id_b long")
    from kafka_avro_pipeline_java_spark.operators.graph import k_core

    got = {r.node: r.degree for r in k_core(df, 3).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in got.values())


def test_k_core_rounds_prefix_reaches_fixpoint(spark, sf_dir):
    from kafka_avro_pipeline_java_spark.operators import dedup
    from kafka_avro_pipeline_java_spark.operators.graph import (
        k_core,
        k_core_rounds,
    )
    from kafka_avro_pipeline_java_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_pairs_portable(
        d, "text", "doc_id", max_hamming=2
    ).select("id_a", "id_b")
    fixpoint = {
        (r.node, r.degree) for r in k_core(pairs, 3).collect()
    }
    prefix = {
        (r.node, r.degree) for r in k_core_rounds(pairs, 3, 3).collect()
    }
    # three rounds suffice on this graph: the oracle-backed prefix IS the
    # fixpoint (if the testdata ever deepens the peeling, bump rounds in
    # plans/graph.py::graph_kcore_rounds and this assertion together)
    assert prefix == fixpoint


def test_link_prediction_scores_toy_graph(spark):
    # path a-b-c plus hub d connected to a,b,c:
    #   candidates (non-adjacent, sharing neighbors): (a,c) via {b,d}
    from kafka_avro_pipeline_java_spark.operators.graph import (
        link_prediction_scores,
    )

    und = [("a", "b"), ("b", "c"), ("d", "a"), ("d", "b"), ("d", "c")]
    sym = und + [(v, u) for u, v in und]
    edges = spark.createDataFrame(sym, ["src", "dst"])
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in link_prediction_scores(edges, k=10).collect()
    }
    import math

    assert ("a", "c") in rows
    r = rows[("a", "c")]
    assert r["cn"] == 2  # common neighbors b and d
    # deg a=2, c=2, cn=2 -> jaccard 2/(2+2-2)=1.0
    assert r["jaccard"] == 1.0
    aa = round(round(1e6 / math.log(3)) + round(1e6 / math.log(3))) / 1e6
    assert abs(r["adamic_adar"] - round(aa, 6)) < 1e-9
    # adjacent pairs must be absent
    assert ("a", "b") not in rows and ("b", "c") not in rows
