"""Sketch/approximate aggregates and sampling — the operators that replace
their exact counterparts at 100 TB (mergeable, one-pass, bounded memory).
Engine-specific estimators can't hash-match a DuckDB oracle, so these are
rows-only driver checks; tests bound their error against exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query("approx_distinct_customers")
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — the scale substitute for exact
    countDistinct (no per-group value set, fixed-size sketch, mergeable
    across partitions without a second shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers_approx"),
        F.count("*").alias("n_orders"),
    )


@query("approx_percentile_prices")
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10_000
        ).alias("pcts")
    ).select(
        "l_returnflag",
        F.round(F.element_at("pcts", 1), 2).alias("p50_approx"),
        F.round(F.element_at("pcts", 2), 2).alias("p95_approx"),
    )


@query(
    "profile_orders",
    oracle="""
    SELECT COUNT(*)                                        AS n_rows,
           COUNT(o_custkey)                                AS custkey_nonnull,
           COUNT(DISTINCT o_custkey)                       AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus)                   AS status_distinct,
           ROUND(MIN(o_totalprice), 2)                     AS price_min,
           ROUND(MAX(o_totalprice), 2)                     AS price_max,
           ROUND(AVG(o_totalprice), 2)                     AS price_avg,
           CAST(MIN(o_orderdate) AS TIMESTAMP)             AS date_min,
           CAST(MAX(o_orderdate) AS TIMESTAMP)             AS date_max
    FROM orders
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (the data-quality screen every
    training-data ingest runs): null/distinct counts, ranges — one scan,
    one aggregate, no shuffle of raw rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
        F.round(F.avg("o_totalprice"), 2).alias("price_avg"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
    )


@query("sample_lineitem")
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + aggregate — the scan-reduction primitive
    for estimation pipelines (sampling happens AT the scan, pre-shuffle)."""
    l = load_table(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)
    return l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price_sampled"),
    )
