"""Sketch/approximate aggregates and sampling — the operators that replace
their exact counterparts at 100 TB (mergeable, one-pass, bounded memory).
Engine-specific estimators (HLL++, t-digest) can't hash-match a DuckDB
oracle, so those are rows-only driver checks with error-bound tests;
`sample_lineitem` uses the portable seeded hash gate instead of Spark's
RNG and therefore carries a full value oracle.
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


@query(
    "sample_lineitem",
    oracle="""
    WITH sampled AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem
      WHERE CAST(('0x' || substr(md5(
              CAST(l_orderkey AS VARCHAR) || ':' ||
              CAST(l_linenumber AS VARCHAR) || ':smp42'), 1, 15)) AS BIGINT)
            < 115292150460684697
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ROUND(AVG(l_extendedprice), 2) AS avg_price_sampled
    FROM sampled GROUP BY l_returnflag
    """,
)
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + aggregate — the scan-reduction primitive
    for estimation pipelines. The gate is a PORTABLE seeded hash on the
    row key (md5 of (l_orderkey, l_linenumber, seed) < p·2^60) rather
    than Spark's `.sample()` RNG: same one-pass pre-shuffle filter shape
    (evaluates in the scan stage, no extra exchange), but any engine
    reproduces the identical sample — which turns this from a rows-only
    row into a value-checked oracle row, and is what makes a 100 TB
    sample AUDITABLE (re-runs and downstream engines agree row-for-row,
    no RNG-state dependence on partition layout)."""
    from ..functions.hashing import portable_hash64

    l = load_table(spark, sf_dir, "lineitem")
    seeded = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
        F.lit(":smp42"),
    )
    # p·2^60 as the EXACT integer (1<<60)//10 — the same literal appears in
    # the oracle so both engines gate on an identical integer comparison
    sampled = l.filter(portable_hash64(seeded) < (1 << 60) // 10)
    return sampled.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price_sampled"),
    )
