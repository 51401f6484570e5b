"""Data-engineering round-out: SCD2 merge, join-key skew diagnostics, and
robust (IQR) outlier detection.

These are the warehouse-operations queries around the analytic core: the
upsert primitive parquet lacks (MERGE INTO expressed relationally), the
skew dashboard that tells you WHICH join key needs salting before the 100×
scale-up, and the robust outlier fence that doesn't move when the outliers
themselves do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.merge import scd2_apply
from ..sources import load_table
from .registry import query


@query(
    "merge_scd2_customers",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, 0 AS valid_from,
             CAST(NULL AS INT) AS valid_to
      FROM customer
    ), updates AS (
      SELECT c_custkey, 'RELOCATED' AS c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
    ), changed AS (
      SELECT d.c_custkey FROM dim d JOIN updates u USING (c_custkey)
      WHERE d.valid_to IS NULL AND d.c_mktsegment <> u.c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, valid_from, valid_to FROM (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE d.valid_to END AS valid_to
      FROM dim d LEFT JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, 1, CAST(NULL AS INT)
      FROM updates u JOIN changed c USING (c_custkey)
    )
    """,
)
def merge_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 upsert: apply a CDC batch (every 7th customer re-segmented to
    'RELOCATED') to a version-0 dimension — changed keys get their current
    row closed at version 1 and a fresh open row appended; unchanged and
    no-op keys stay put. One broadcast join against CURRENT rows plus a
    three-branch union; the dimension never shuffles
    (operators/merge.py)."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey", "c_mktsegment",
        F.lit(0).alias("valid_from"), F.lit(None).cast("int").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("RELOCATED").alias("c_mktsegment")
    )
    return scd2_apply(
        dim, updates, "c_custkey", ["c_mktsegment"], new_version=1
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH counts AS (
      SELECT o_custkey, CAST(COUNT(*) AS DOUBLE) AS c FROM orders GROUP BY 1
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, o_custkey) AS r FROM counts
    )
    SELECT CAST(COUNT(*) AS INT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           ROUND((2.0 * SUM(r * c) - (COUNT(*) + 1) * SUM(c))
                 / (COUNT(*) * SUM(c)), 6) AS gini,
           ROUND(MAX(c) / SUM(c), 6) AS max_key_share
    FROM ranked
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew dashboard for orders.o_custkey: per-key counts, Gini
    coefficient of the key distribution, and the heaviest key's share —
    the pre-flight check that decides salting / AQE-skew settings BEFORE a
    join ships 100 TB. Counts are a word-count agg (key-cardinality
    sized); the rank window runs over keys, never rows. Gini via the
    rank-weighted closed form, deterministic (count, key) tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count("*").cast("double").alias("c"))
    ranked = counts.select(
        "c", F.row_number().over(Window.orderBy("c", "o_custkey")).alias("r")
    )
    n, tot = F.count("*"), F.sum("c")
    return ranked.agg(
        n.cast("int").alias("n_keys"),
        tot.cast("bigint").alias("n_rows"),
        F.round(
            (2.0 * F.sum(F.col("r") * F.col("c")) - (n + 1) * tot) / (n * tot), 6
        ).alias("gini"),
        F.round(F.max("c") / tot, 6).alias("max_key_share"),
    )


@query(
    "agg_price_outliers_iqr",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS p
      FROM orders
    ), fences AS (
      SELECT o_orderpriority,
             quantile_cont(p, 0.25) AS q1, quantile_cont(p, 0.75) AS q3
      FROM cents GROUP BY 1
    )
    SELECT c.o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE c.p > f.q3 + 1.5 * (f.q3 - f.q1)
                                    OR c.p < f.q1 - 1.5 * (f.q3 - f.q1)) AS INT)
             AS n_outliers,
           CAST(COUNT(*) AS INT) AS n_orders,
           ROUND(f.q1 / 100.0, 2) AS q1, ROUND(f.q3 / 100.0, 2) AS q3
    FROM cents c JOIN fences f USING (o_orderpriority)
    GROUP BY c.o_orderpriority, f.q1, f.q3
    """,
)
def agg_price_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: Tukey fences (1.5×IQR) per order
    priority over total price — the outlier count that doesn't move when
    the outliers themselves grow. Quartiles interpolate over integer
    CENTS (the agg_percentiles trick — midpoints stay float-exact across
    engines); fences join back broadcast, flagging happens in the join
    projection. At 100 TB swap percentile → approx_percentile (t-digest,
    mergeable) and keep the rest of the plan."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("p"),
    )
    fences = cents.groupBy("o_orderpriority").agg(
        F.percentile("p", F.lit(0.25)).alias("q1"),
        F.percentile("p", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("p") > F.col("q3") + 1.5 * iqr) | (
        F.col("p") < F.col("q1") - 1.5 * iqr
    )
    return (
        cents.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.sum(out.cast("int")).cast("int").alias("n_outliers"),
            F.count("*").cast("int").alias("n_orders"),
        )
        .select(
            "o_orderpriority", "n_outliers", "n_orders",
            F.round(F.col("q1") / 100.0, 2).alias("q1"),
            F.round(F.col("q3") / 100.0, 2).alias("q3"),
        )
    )
