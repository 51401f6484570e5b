"""Relational completeness round-out: UNPIVOT (wide→long melt, the
inverse of the pivot query in relational2) and the distribution window
functions (percent_rank / cume_dist / nth_value) the rank zoo didn't yet
cover. Both are pure single-shuffle plans with full DuckDB value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 1000
    )
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: four lineitem measure columns into long
    (key, measure, value) rows — the inverse of `pivot_status_by_priority`
    and the shape change every metrics store / long-format ML feature
    table needs. Spark's native `unpivot` is a zero-shuffle projection
    (each input row expands in place in the scan stage — no exchange, no
    state), so at 100 TB it is scan-bound; the oracle spells the same
    relation as a portable 4-way UNION ALL. The orderkey slice keeps the
    compared row set bounded; the plan is identical without it."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@query(
    "window_dist_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_orderkey
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over each customer's orders by
    spend: percent_rank (rank-1)/(n-1), cume_dist, and nth_value(2) with
    the explicit running frame both engines default differently on —
    completing the window surface next to `window_rank_variants`
    (rank/dense_rank/ntile/lead) and `window_range_frame` (RANGE frames).
    Same scale shape as every window query here: one keyed shuffle,
    per-key sort, no global order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_run).alias("second_orderkey"),
    )
