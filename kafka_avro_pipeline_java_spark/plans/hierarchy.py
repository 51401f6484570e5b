"""Recursive-hierarchy queries: the WITH RECURSIVE workloads Spark can't
express declaratively, flattened with the pointer-jumping operator
(operators/hierarchy.py) in O(log depth) self-join rounds.

The forest is a deterministic function of p_partkey (part_forest), so
DuckDB can rebuild the identical structure and walk it with a real
recursive CTE — the oracle here is genuinely a different ALGORITHM
(sequential depth-first recursion) validating the distributed
log-rounds flattening, not a restatement of the same plan.

Oracle discipline: depths/counts/products are integer-exact end to end;
the only doubles are final ROUND()ed averages of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.hierarchy import part_forest, pointer_jump
from ..sources import load_table
from .registry import query

# Shared DuckDB CTEs: rebuild the same forest and walk it recursively.
_WALK_CTE = """
WITH RECURSIVE child AS (
  SELECT p_partkey AS node,
         CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))
              AS BIGINT) % p_partkey AS par,
         1 + CAST(('0x' || substr(md5('q:' || CAST(p_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS q
  FROM part WHERE p_partkey >= 8
), walk AS (
  SELECT p_partkey AS node, p_partkey AS root, 0 AS depth,
         CAST(1 AS BIGINT) AS units
  FROM part WHERE p_partkey < 8
  UNION ALL
  SELECT c.node, w.root, w.depth + 1, w.units * c.q
  FROM child c JOIN walk w ON c.par = w.node
)
"""


@query(
    "graph_hierarchy_depths",
    oracle=_WALK_CTE
    + """
    SELECT root,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(depth) AS INT) AS max_depth,
           CAST(SUM(depth) AS BIGINT) AS sum_depth,
           ROUND(CAST(SUM(depth) AS DOUBLE) / COUNT(*), 6) AS avg_depth
    FROM walk GROUP BY root ORDER BY root
    """,
)
def graph_hierarchy_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHY FLATTEN — every node's root and depth in a synthetic
    part forest, by pointer jumping: ceil(log2 D) shuffled self-joins
    instead of the D join rounds a naive loop (or a recursive CTE
    executed level-by-level) needs. The oracle walks the identical
    forest with DuckDB's WITH RECURSIVE — a sequential algorithm
    cross-checking the distributed one. 100 TB: each round is one
    equi-join on the ancestor pointer; a 2e11-node random recursive
    tree (expected depth ≈ 71) converges in 7 rounds."""
    part = load_table(spark, sf_dir, "part")
    edges, roots = part_forest(spark, part)
    walk = pointer_jump(edges, roots)
    return (
        walk.groupBy("root")
        .agg(
            F.count("*").alias("n_nodes"),
            F.max("depth").cast("int").alias("max_depth"),
            F.sum("depth").cast("bigint").alias("sum_depth"),
            F.round(
                F.sum("depth").cast("double") / F.count("*"), 6
            ).alias("avg_depth"),
        )
        .orderBy("root")
    )


@query(
    "graph_bom_rollup",
    oracle=_WALK_CTE
    + """
    , leaves AS (
      SELECT node FROM walk WHERE node NOT IN (SELECT par FROM child)
    )
    SELECT w.root,
           CAST(COUNT(*) AS BIGINT) AS n_leaves,
           CAST(SUM(w.units) AS BIGINT) AS total_units,
           CAST(MAX(w.units) AS BIGINT) AS max_path_units
    FROM walk w JOIN leaves l ON w.node = l.node
    GROUP BY w.root ORDER BY w.root
    """,
)
def graph_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM EXPLOSION ROLLUP — total leaf units per assembly root, where
    each edge carries a multiplicity q ∈ {1,2} and a leaf contributes
    the PRODUCT of q along its path to the root (the classic "how many
    of component X does one unit of product Y need" aggregating
    recursion). Pointer jumping carries the multiplicative path
    aggregate through the same log-rounds doubling as depth; leaves are
    the anti-join of nodes against distinct parents. Products stay in
    LongType (q ≤ 2, depth ≤ ~60 at any realistic scale — the operator
    docstring records the decimal(38,0) upgrade path)."""
    part = load_table(spark, sf_dir, "part")
    edges, roots = part_forest(spark, part)
    walk = pointer_jump(edges, roots, units="q")
    leaves = walk.join(
        edges.select(F.col("par").alias("p_node")).distinct(),
        walk["node"] == F.col("p_node"),
        "left_anti",
    )
    return (
        leaves.groupBy("root")
        .agg(
            F.count("*").alias("n_leaves"),
            F.sum("units").cast("bigint").alias("total_units"),
            F.max("units").cast("bigint").alias("max_path_units"),
        )
        .orderBy("root")
    )
