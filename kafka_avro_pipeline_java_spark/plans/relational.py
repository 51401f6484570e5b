"""Relational query surface (SURVEY.md §2B) over the TPC-H-ish tables.

The reference implements no relational operators (SURVEY.md §2A — its only
SQL is DDL and point INSERT/SELECT, e.g. reference
``03-consumer/src/main/java/com/exam/worker/MySQLProcessData.java:47-48,111``),
so this module IS the query engine surface mandated by BASELINE.json.

Scale notes (local[32] tests, 1000-executor design):
- filters are applied straight on the parquet scan → Catalyst pushes them
  into ``PushedFilters``; projections prune ``ReadSchema``;
- ``region``/``nation`` arrive pre-wrapped in ``broadcast()`` (bounded
  dimensions); other join strategies are left to Catalyst + AQE, which
  picks broadcast vs sort-merge from runtime stats;
- aggregations use built-in hash aggregates with map-side partial
  aggregation — no Python in any hot path in this module.
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
# Projection + filter (the minimal scan shape: pruned columns, pushed
# predicate — ReadSchema shows only the 4 referenced columns)
# --------------------------------------------------------------------------
@query(
    "filter_project_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'R'
    """,
)
def filter_project_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-row IEEE arithmetic is bit-identical across engines — no rounding
    # needed (rounding would actually INTRODUCE nondeterminism: the 2dp×2dp
    # product ties exactly at .xx5, where float repr decides the direction)
    l = _t(spark, sf_dir, "lineitem")
    return l.filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 style pricing summary (filter + hash agg, 8 measures)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(ROUND(l_extendedprice * 100, 0)) / 100.0, 2)      AS sum_base_price,
           ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)) / 10000.0, 2) AS sum_disc_price,
           ROUND(SUM(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0)) / 1000000.0, 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.round(F.col("l_extendedprice") * 100, 0)) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(F.round(disc_price * 10000, 0)) / 10000.0, 2).alias("sum_disc_price"),
            F.round(F.sum(F.round(disc_price * (1 + F.col("l_tax")) * 1000000, 0)) / 1000000.0, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 3-way join + agg + top-k: TPC-H Q3 style shipping priority (flagship)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)) / 10000.0, 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0))
                / 10000.0, 2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# 6-way join: TPC-H Q5 style local-supplier volume
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)) / 10000.0, 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")  # broadcast (bounded dim)
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")  # broadcast
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0))
                / 10000.0, 2,
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Scalar aggregate with tight pushed-down filter: TPC-H Q6 style
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(ROUND(l_extendedprice * l_discount * 10000, 0)) / 10000.0, 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000, 0))
                / 10000.0, 2,
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# Non-equi (theta) semi-join: TPC-H Q4 style order priority check —
# orders having at least one line item shipped >90 days after the order date
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Join family: inner / left / semi / anti over customer × orders
# --------------------------------------------------------------------------
@query(
    "join_inner_segment_sales",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(ROUND(o.o_totalprice * 100, 0)) / 100.0, 2) AS total_sales
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.round(F.col("o_totalprice") * 100, 0)) / 100.0, 2).alias("total_sales"),
        )
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Range (band) join against a small in-query tier dimension — broadcast NLJ
# --------------------------------------------------------------------------
_TIERS = [
    (0.0, 100_000.0, "small"),
    (100_000.0, 250_000.0, "medium"),
    (250_000.0, 1e18, "large"),
]


@query(
    "join_range_price_tiers",
    oracle="""
    SELECT t.tier, COUNT(*) AS n_orders,
           ROUND(SUM(ROUND(o.o_totalprice * 100, 0)) / 100.0, 2) AS total_sales
    FROM orders o
    JOIN (VALUES (0.0, 100000.0, 'small'),
                 (100000.0, 250000.0, 'medium'),
                 (250000.0, 1e18, 'large')) AS t(lo, hi, tier)
      ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
    GROUP BY t.tier
    """,
)
def join_range_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    tiers = F.broadcast(
        spark.createDataFrame(_TIERS, schema="lo double, hi double, tier string")
    )
    return (
        o.join(tiers, (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.round(F.col("o_totalprice") * 100, 0)) / 100.0, 2).alias("total_sales"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation variants: distinct, rollup, cube, grouping sets
# --------------------------------------------------------------------------
@query(
    "agg_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_rollup_year_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(SUM(ROUND(o_totalprice * 100, 0)) / 100.0, 2) AS total_sales
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderstatus)
    """,
)
def agg_rollup_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    return o.rollup("o_year", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.round(F.col("o_totalprice") * 100, 0)) / 100.0, 2).alias("total_sales"),
    )


@query(
    "agg_cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(ROUND(o_totalprice * 100, 0)) / 100.0, 2) AS total_sales
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    o = _t(spark, sf_dir, "orders")
    view = f"orders_gs_{uuid.uuid4().hex[:8]}"  # collision-free temp view
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(ROUND(o_totalprice * 100, 0)) / 100.0, 2) AS total_sales
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Window functions: ranking, lag, running frame
# --------------------------------------------------------------------------
@query(
    "window_rank_top_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(ROUND(o_totalprice * 100, 0)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2) AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.round(F.col("o_totalprice") * 100, 0)).over(w) / 100.0, 2).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Sort / limit (deterministic top-k with unique tiebreak)
# --------------------------------------------------------------------------
@query(
    "sort_limit_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Set operations (SQL UNION/INTERSECT/EXCEPT are DISTINCT variants)
# --------------------------------------------------------------------------
@query(
    "set_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --------------------------------------------------------------------------
# Scalar function surface: string / date / math / json
# --------------------------------------------------------------------------
@query(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                  AS name_upper,
           CAST(LENGTH(p_name) AS INT)                    AS name_len,
           SUBSTRING(p_type, 1, 5)                        AS type_prefix,
           CONCAT(p_brand, ':', p_type)                   AS brand_type,
           REGEXP_EXTRACT(p_type, '^(\\w+)', 1)           AS type_first_word
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
    )


@query(
    "scalar_date_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)    AS o_year,
           CAST(quarter(o_orderdate) AS INT) AS o_quarter,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            F.quarter("o_orderdate").alias("o_quarter"),
            "o_totalprice",
        )
        .groupBy("o_year", "o_quarter")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


@query(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6)        AS disc_dev,
           ROUND(SQRT(l_quantity), 6)              AS qty_sqrt,
           ROUND(LN(l_extendedprice), 6)           AS price_ln,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           MOD(l_orderkey, 7)                      AS key_mod7
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "scalar_json_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    """,
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )
