"""Second wave of relational coverage: subqueries, statistical aggregates,
pivot, additional window frames/functions, conditional scalars, array
functions, and percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): lineitems under 50% of the
# part's average quantity
# --------------------------------------------------------------------------
@query(
    "subquery_below_avg_quantity",
    oracle="""
    SELECT ROUND(SUM(ROUND(l.l_extendedprice * 100, 0)) / 100.0 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def subquery_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery decorrelated the scalable way: pre-aggregate
    per-part averages once, join — Catalyst does the same rewrite for the
    SQL form; one extra shuffle instead of per-row subquery execution."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = l.groupBy("l_partkey").agg((0.5 * F.avg("l_quantity")).alias("half_avg"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0)) / 100.0 / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


# --------------------------------------------------------------------------
# IN / NOT IN subqueries
# --------------------------------------------------------------------------
@query(
    "subquery_in_top_nations",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def subquery_in_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return c.join(
        n, c.c_nationkey == n.n_nationkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Statistical aggregates
# --------------------------------------------------------------------------
@query(
    "agg_stats_prices",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS price_stddev,
           ROUND(VAR_SAMP(o_totalprice), 2)    AS price_var,
           ROUND(MIN(o_totalprice), 2)         AS price_min,
           ROUND(MAX(o_totalprice), 2)         AS price_max
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("o_totalprice"), 2).alias("price_var"),
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.5)
                 / 100.0, 2)  AS p50,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.95)
                 / 100.0, 2) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark ``percentile`` == DuckDB ``quantile_cont``,
    both linear interpolation). Interpolation runs over integer CENTS: the
    2-decimal prices make p50 midpoints land exactly on .005 boundaries
    where float noise flips the rounding — integer halves are exact in
    doubles, so both engines agree. At 100 TB use ``approx_percentile`` —
    t-digest sketch, one pass, mergeable."""
    l = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    # one array-percentile aggregate: a single per-group sort serves both
    # quantiles (two scalar percentile() calls each re-sorted the group)
    ps = F.percentile(cents, F.array(F.lit(0.5), F.lit(0.95)))
    return (
        l.groupBy("l_returnflag")
        .agg(ps.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0] / 100.0, 2).alias("p50"),
            F.round(F.col("ps")[1] / 100.0, 2).alias("p95"),
        )
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_orderkey) FILTER (WHERE o_totalprice = mx) AS top_orderkey,
           ROUND(ANY_VALUE(mx), 2) AS top_price
    FROM (
      SELECT *, MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
      FROM orders)
    GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax per group (max_by with deterministic tiebreak on the key)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    return (
        o.withColumn("mx", F.max("o_totalprice").over(w))
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("o_totalprice") == F.col("mx"), F.col("o_orderkey"))).alias(
                "top_orderkey"
            ),
            F.round(F.first("mx"), 2).alias("top_price"),
        )
    )


# --------------------------------------------------------------------------
# Pivot
# --------------------------------------------------------------------------
@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


# --------------------------------------------------------------------------
# Window function zoo: rank/dense_rank/ntile/lead + RANGE frame
# --------------------------------------------------------------------------
@query(
    "window_rank_variants",
    oracle="""
    SELECT o_orderkey, o_custkey,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
             AS n_similar_priced
    FROM orders WHERE o_custkey <= 50
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers within ±10k of the current order's price."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.count("*").over(w).alias("n_similar_priced"),
    )


# --------------------------------------------------------------------------
# Conditional scalars: CASE / COALESCE / NULLIF / IF
# --------------------------------------------------------------------------
@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 250000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_display,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 250000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_display"
        ),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


# --------------------------------------------------------------------------
# Array functions over the embeddings table
# --------------------------------------------------------------------------
@query(
    "scalar_array_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(list_aggregate(embedding, 'sum') AS DOUBLE), 4) AS vec_sum,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS vec_max,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component
    FROM embeddings
    """,
)
def scalar_array_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
    )


# --------------------------------------------------------------------------
# union all (bag semantics, unlike set_union_nations)
# --------------------------------------------------------------------------
@query(
    "set_union_all_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return o.union(c)


# --------------------------------------------------------------------------
# exists-with-aggregate (TPC-H Q22 shape): customers with above-average
# balance and no orders
# --------------------------------------------------------------------------
@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_custs,
           ROUND(SUM(ROUND(c.c_acctbal * 100, 0)) / 100.0, 2) AS total_bal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 150000)
    GROUP BY n.n_name
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab")).first()["ab"]
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum(F.round(F.col("c_acctbal") * 100, 0)) / 100.0, 2).alias("total_bal"),
        )
    )


@query(
    "agg_salted_distinct_customers",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_salted_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct through the explicit hot-group salting path
    (operators/skew.py::salted_distinct_count): salt by hash of the
    distinct column, partial distinct per (group, salt), SUM partials.
    The oracle is the plain COUNT(DISTINCT) — the salted plan must be
    value-identical, which is what makes the skew mitigation safe to
    reach for at 100 TB."""
    from ..operators.skew import salted_distinct_count

    o = _t(spark, sf_dir, "orders")
    return salted_distinct_count(
        o, ["o_orderpriority"], "o_custkey", n_salts=64, alias="n_customers"
    )


@query(
    "scalar_map_order_attrs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           3 AS n_keys,
           'odate,priority,status' AS key_list
    FROM orders
    """,
)
def scalar_map_order_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map, merge another with
    map_concat, read it back via element_at / map_keys / size. The oracle
    checks the extracted VALUES directly (DuckDB's map semantics differ;
    the point is that the map round-trip loses nothing). Maps stay inside
    codegen — at scale this is projection-only."""
    o = _t(spark, sf_dir, "orders")
    m = F.map_concat(
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ),
        F.create_map(F.lit("odate"), F.col("o_orderdate").cast("string")),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status"),
        F.element_at(m, "priority").alias("priority"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("key_list"),
    )
