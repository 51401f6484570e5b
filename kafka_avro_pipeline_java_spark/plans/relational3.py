"""Third coverage wave: full outer join, cross join, explode/lateral,
date arithmetic, string function zoo."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "join_full_outer_activity",
    oracle="""
    WITH big_buyers AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
    ), neg_balance AS (
      SELECT c_custkey AS custkey, c_acctbal
      FROM customer WHERE c_acctbal < 0
    )
    SELECT COALESCE(b.custkey, n.custkey) AS custkey,
           b.n_big, n.c_acctbal
    FROM big_buyers b FULL OUTER JOIN neg_balance n ON b.custkey = n.custkey
    """,
)
def join_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        o.filter(F.col("o_totalprice") > 200000)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_big"))
    )
    neg = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey"), "c_acctbal"
    )
    j = big.alias("b").join(neg.alias("n"), F.col("b.custkey") == F.col("n.custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("b.custkey"), F.col("n.custkey")).alias("custkey"),
        "n_big",
        "c_acctbal",
    )


@query(
    "join_cross_region_segments",
    oracle="""
    SELECT r.r_name, s.seg, COUNT(c.c_custkey) AS n_custs
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey AND c.c_mktsegment = s.seg
    GROUP BY r.r_name, s.seg
    """,
)
def join_cross_region_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dims (dense grid), left-joined to facts —
    the standard 'all combinations incl. empty cells' report shape."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    segs = c.select(F.col("c_mktsegment").alias("seg")).distinct()
    grid = r.crossJoin(F.broadcast(segs))
    return (
        grid.join(n, n.n_regionkey == r.r_regionkey, "left")
        .join(
            c,
            (c.c_nationkey == n.n_nationkey) & (c.c_mktsegment == F.col("seg")),
            "left",
        )
        .groupBy("r_name", "seg")
        .agg(F.count("c_custkey").alias("n_custs"))
    )


@query(
    "explode_doc_tokens",
    oracle="""
    SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def explode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode → token frequency table (the UNNEST/LATERAL VIEW
    shape; also the first stage of any inverted index build)."""
    from ..functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT ROUND(SUM(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)) / 10000.0, 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates across
    both join sides — the optimizer extracts the common sub-predicates
    (brand IN (...), quantity/size bounds) and pushes them below the join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0))
            / 10000.0, 2,
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)              AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           CAST(last_day(o_orderdate) AS DATE)                      AS month_end,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR)          AS year_month
    FROM orders WHERE o_custkey <= 20
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@query(
    "scalar_string_zoo",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0')     AS padded_key,
           trim(p_name)                                   AS trimmed,
           replace(p_type, ' ', '_')                      AS type_snake,
           CAST(strpos(p_type, 'BRASS') AS INT)           AS brass_pos,
           reverse(p_brand)                               AS brand_rev,
           repeat(p_brand, 2)                             AS brand_twice,
           left(p_name, 3)                                AS name3,
           CAST(contains(p_type, 'STEEL') AS BOOLEAN)     AS is_steel
    FROM part
    """,
)
def scalar_string_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim("p_name").alias("trimmed"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr("p_type", "BRASS").alias("brass_pos"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.substring("p_name", 1, 3).alias("name3"),
        F.col("p_type").contains("STEEL").alias("is_steel"),
    )
