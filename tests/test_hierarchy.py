"""Pointer-jumping hierarchy flattening (operators/hierarchy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.hierarchy import (
    part_forest,
    pointer_jump,
)


def _forest(spark, edges, roots, units=None):
    cols = ["node", "par"] + (["q"] if units else [])
    e = spark.createDataFrame(edges, cols)
    r = spark.createDataFrame([(x,) for x in roots], ["node"])
    return pointer_jump(e, r, units="q" if units else None)


def test_chain_depths_need_log_rounds(spark):
    # 0 ← 1 ← 2 ← ... ← 20: depth 20 chain, converges via doubling.
    edges = [(i, i - 1) for i in range(1, 21)]
    out = _forest(spark, edges, [0])
    got = {r["node"]: (r["root"], r["depth"]) for r in out.collect()}
    assert got == {i: (0, i) for i in range(21)}


def test_star_and_two_trees(spark):
    # two roots: 0 with a 5-leaf star, 10 with a 2-chain
    edges = [(i, 0) for i in range(1, 6)] + [(11, 10), (12, 11)]
    out = _forest(spark, edges, [0, 10])
    got = {r["node"]: (r["root"], r["depth"]) for r in out.collect()}
    assert got[3] == (0, 1)
    assert got[12] == (10, 2)
    assert got[10] == (10, 0)


def test_units_multiply_along_path(spark):
    # 0 ← 1 (q=2) ← 2 (q=3) ← 3 (q=5): path products 2, 6, 30
    edges = [(1, 0, 2), (2, 1, 3), (3, 2, 5)]
    out = _forest(spark, edges, [0], units=True)
    got = {r["node"]: r["units"] for r in out.collect()}
    assert got == {0: 1, 1: 2, 2: 6, 3: 30}


def test_nonconvergence_raises(spark):
    edges = [(i, i - 1) for i in range(1, 10)]  # depth 9 > 2^2 jumps... 2^3=8<9
    e = spark.createDataFrame(edges, ["node", "par"])
    r = spark.createDataFrame([(0,)], ["node"])
    with pytest.raises(RuntimeError, match="did not converge"):
        pointer_jump(e, r, max_rounds=3)


def test_exact_boundary_convergence_does_not_raise(spark):
    # depth-8 chain converges exactly ON the 3rd jump (2^3 = 8): the
    # post-loop re-check must accept it instead of raising (r10 advice).
    edges = [(i, i - 1) for i in range(1, 9)]
    e = spark.createDataFrame(edges, ["node", "par"])
    r = spark.createDataFrame([(0,)], ["node"])
    got = {x["node"]: x["depth"] for x in pointer_jump(e, r, max_rounds=3).collect()}
    assert got == {i: i for i in range(9)}


def test_part_forest_total_on_one_based_keys(spark):
    # bare hash % key parents ~ln(n) keys at 0 — on a 1-based domain those
    # subtrees would vanish from the inner join; the MIN-clamp keeps the
    # forest total regardless of key origin (r10 advice).
    part = spark.range(1, 400).select(F.col("id").alias("p_partkey"))
    edges, roots = part_forest(spark, part)
    assert edges.where(F.col("par") < 1).count() == 0
    assert edges.where(F.col("par") >= F.col("node")).count() == 0
    walk = pointer_jump(edges, roots)
    assert walk.count() == 399  # every key resolves: nothing dropped


def test_part_forest_is_acyclic_and_total(spark, sf_dir):
    from kafka_avro_pipeline_java_spark.sources import load_table

    part = load_table(spark, sf_dir, "part")
    edges, roots = part_forest(spark, part)
    n_parts = part.count()
    # parent strictly below the node: acyclic by construction
    assert edges.where(F.col("par") >= F.col("node")).count() == 0
    walk = pointer_jump(edges, roots)
    # total: every part key lands on exactly one root at a finite depth
    assert walk.count() == n_parts
    assert walk.select("node").distinct().count() == n_parts
    assert walk.where(F.col("root") >= 8).count() == 0


def test_transitive_closure_chain(spark):
    from kafka_avro_pipeline_java_spark.operators.hierarchy import (
        transitive_closure,
    )

    # 0 ← 1 ← 2 ← 3: closure has (n, a, n-a) for all a < n with parent rows
    edges = [(i, i - 1) for i in range(1, 4)]
    e = spark.createDataFrame(edges, ["node", "par"])
    got = {
        (r["node"], r["anc"]): r["dist"]
        for r in transitive_closure(e).collect()
    }
    assert got == {
        (1, 0): 1, (2, 1): 1, (3, 2): 1,
        (2, 0): 2, (3, 1): 2, (3, 0): 3,
    }


def test_pointer_jump_nonpositive_max_rounds_raises(spark):
    """r14 (ADVICE r13): with max_rounds <= 0 the loop body never runs and
    no observation exists — the unconverged initial state must RAISE via
    the root-set re-check, not be returned silently."""
    import pytest

    from kafka_avro_pipeline_java_spark.operators.hierarchy import pointer_jump

    edges = spark.createDataFrame([(2, 1), (3, 2)], ["node", "par"])
    roots = spark.createDataFrame([(1,)], ["node"])
    with pytest.raises(RuntimeError, match="did not converge"):
        pointer_jump(edges, roots, max_rounds=0)
    # a forest that IS already flat (every edge points at a root) passes
    flat = spark.createDataFrame([(2, 1)], ["node", "par"])
    out = pointer_jump(flat, roots, max_rounds=0)
    assert {(r["node"], r["root"]) for r in out.collect()} == {(1, 1), (2, 1)}
