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

from ..operators import merge
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
    sized); the key domain scales with the corpus, so the global rank
    uses the two-phase range-partitioned scan (operators/ranking.py) —
    never a single-partition window. Gini via the rank-weighted closed
    form, deterministic (count, key) tiebreak."""
    from ..operators.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count("*").cast("double").alias("c"))
    ranked = attach_global_order_stats(
        counts, [("c", "asc"), ("o_custkey", "asc")], row_number="r"
    ).select("c", "r")
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


@query(
    "agg_moments_skew_kurtosis",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 2) - 3.0, 6) AS excess_kurtosis
    FROM s
    """,
)
def agg_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of quantity per return
    flag, computed from EXACT integer power sums (Σx..Σx⁴ over int
    quantities stay integer-exact, so the closed-form moments match the
    oracle bit-for-bit — built-in `skewness`/`kurtosis` would drift on
    engine-specific accumulation order). One map-side-combined agg; the
    moment algebra is driver-free projection math."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    m1, m2, m3, m4 = (F.col(c) / F.col("n") for c in ("s1", "s2", "s3", "s4"))
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) / F.pow(var, 2) - 3.0
    return s.select(
        "l_returnflag",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
    )


@query(
    "agg_correlation_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_qty_price
    FROM c
    """,
)
def agg_correlation_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag from
    exact integer sums (quantities are ints, prices become cents) — the
    same determinism trick as the moments query: the only doubles appear
    AFTER aggregation, in identical closed-form algebra, so the oracle
    hash matches exactly where built-in `corr` would wobble in the last
    ulp across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    c = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return c.select("l_returnflag", F.round(corr, 6).alias("corr_qty_price"))


@query(
    "basket_item_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM baskets
    ), item AS (
      SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS c FROM baskets GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_both,
           ROUND(p.n_both * n.n_orders / (ia.c * ib.c), 4) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b, n
    """,
)
def basket_item_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order at
    least twice, scored by lift = P(a,b)/(P(a)·P(b)) — the co-purchase
    affinity a recommender or assortment planner starts from. Pairs are
    generated INSIDE each basket: one collect_set shuffle keyed by order,
    then array higher-order functions emit the C(size,2) ordered pairs
    (~4 items/order, so per-row fan-out is bounded by basket size², never
    the catalog). Round-6 change: this replaces a baskets-self-join —
    same keying, but one shuffle instead of distinct+join and no join
    build side; measured 2.25 s -> 1.65 s median at sf0.1, result
    bit-identical. Supports and lift are exact integer counts in closed
    form, so the oracle hash matches exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    # r14 (guide §2.4): the basket table feeds n_orders, the item counts
    # AND the pair fan-out — three derivations of the scan + collect_set
    # shuffle (8 parquet scans in the before-plan). One order-count-sized
    # materialization serves all three.
    per_order = (
        l.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .localCheckpoint(eager=False)
    )
    n_orders = per_order.agg(F.count("*").cast("double").alias("n_orders"))
    item = (
        per_order.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").cast("double").alias("c"))
    )
    pair = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "n_both",
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("ca") * F.col("cb")), 4
            ).alias("lift"),
        )
    )


@query(
    "merge_scd2_snapshot_asof",
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
    ), merged AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE d.valid_to END AS valid_to
      FROM dim d LEFT JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, 1, CAST(NULL AS INT)
      FROM updates u JOIN changed c USING (c_custkey)
    )
    SELECT c_custkey, c_mktsegment
    FROM merged
    WHERE valid_from <= 0 AND (valid_to IS NULL OR valid_to > 0)
    """,
)
def merge_scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: reconstruct the table AS OF
    version 0 — i.e. after the version-1 CDC batch applied, the query
    still returns the pre-update segments (every history row whose
    validity interval covers the asked version). One scan + one interval
    filter; the snapshot predicate pushes to the scan on a materialized
    SCD2 table."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey", "c_mktsegment",
        F.lit(0).alias("valid_from"), F.lit(None).cast("int").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("RELOCATED").alias("c_mktsegment")
    )
    merged = scd2_apply(dim, updates, "c_custkey", ["c_mktsegment"], new_version=1)
    asof = 0
    return merged.filter(
        (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
    ).select("c_custkey", "c_mktsegment")


@query(
    "agg_ols_qty_price",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6) AS slope,
           ROUND((sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n)
                 / 100.0, 4) AS intercept,
           ROUND(POW(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM c
    """,
)
def agg_ols_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of price on quantity per return flag — slope,
    intercept (both back in dollars), and R² — completing the regression
    family next to `agg_correlation_exact` with the same determinism
    trick: every sum is integer-exact (quantities are ints, prices become
    cents), all doubles appear only in the final algebra, identical on
    both engines. One map-side-combined aggregate; the fit itself is
    driver-free projection math."""
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    c = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope_c = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return c.select(
        "l_returnflag",
        F.round(slope_c / 100.0, 6).alias("slope"),
        F.round((sy / n - slope_c * sx / n) / 100.0, 4).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS p
      FROM orders
    ), fences AS (
      SELECT o_orderpriority,
             quantile_cont(p, 0.05) AS lo, quantile_cont(p, 0.95) AS hi
      FROM cents GROUP BY 1
    )
    SELECT c.o_orderpriority,
           ROUND(AVG(c.p) / 100.0, 4) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(CAST(c.p AS DOUBLE), f.lo), f.hi)) / 100.0, 4)
             AS winsorized_mean
    FROM cents c JOIN fences f USING (o_orderpriority)
    GROUP BY c.o_orderpriority
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (clip to [p5, p95]) of order totals per priority,
    next to the raw mean — the robust location estimate whose gap from
    the raw mean QUANTIFIES tail influence. Same plan family as the IQR
    fences: exact quantiles over integer cents, broadcast fence join,
    clipping in the join projection. AVG over integer cents is a ratio of
    exact integers, so the raw mean matches bit-for-bit; the clipped
    branch mixes in the (float-exact) quantile bounds identically on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("p"),
    )
    fences = cents.groupBy("o_orderpriority").agg(
        F.percentile("p", F.lit(0.05)).alias("lo"),
        F.percentile("p", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("p").cast("double"), F.col("lo")), F.col("hi")
    )
    return (
        cents.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("p") / 100.0, 4).alias("raw_mean"),
            F.round(F.avg(clipped) / 100.0, 4).alias("winsorized_mean"),
        )
    )


@query(
    "agg_modal_priority_by_year",
    oracle="""
    WITH c AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, o_orderpriority AS modal_priority, n
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY yr
                ORDER BY n DESC, o_orderpriority) AS rk
      FROM c
    ) WHERE rk = 1
    """,
)
def agg_modal_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal (most frequent) order priority per year with its count — the
    categorical location statistic, deterministic via the
    (count desc, value) tiebreak. Two shrinking aggregations + a window
    over the (year × priority)-sized table."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("yr").orderBy(F.desc("n"), "o_orderpriority")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("yr", F.col("o_orderpriority").alias("modal_priority"), "n")
    )


@query(
    "agg_customer_ltv_deciles",
    oracle="""
    WITH ltv AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT cents, NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
      FROM ltv
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS INT) AS n_customers,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           ROUND(SUM(cents) / CAST((SELECT SUM(cents) FROM ltv) AS DOUBLE), 6)
             AS revenue_share
    FROM ranked GROUP BY decile
    """,
)
def agg_customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value decile table: per-customer revenue summed
    exactly in cents, customers split into spend deciles (deterministic
    (cents, custkey) order), each decile's headcount, revenue, and share
    of total — the concentration readout ('the top decile is X% of
    revenue') behind every retention budget. Customer-keyed agg, then
    the decile split via the two-phase range-partitioned NTILE
    (operators/ranking.py — customers scale with the corpus, so no
    single-partition window); integer cents keep every sum exact."""
    from ..operators.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    ltv = o.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    ranked = attach_global_order_stats(
        ltv,
        [("cents", "asc"), ("o_custkey", "asc")],
        ntile=(10, "decile"),
    ).select("cents", "decile")
    tot = ltv.agg(F.sum("cents").cast("double").alias("t"))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count("*").cast("int").alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.sum("cents").alias("_c"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers", "revenue",
            F.round(F.col("_c") / F.col("t"), 6).alias("revenue_share"),
        )
    )


@query(
    "agg_rfm_segments",
    oracle="""
    WITH mx AS (
      SELECT MAX(o_orderdate) AS maxd FROM orders
    ), rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', MAX(o_orderdate), mx.maxd) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS monetary
      FROM orders, mx GROUP BY o_custkey, mx.maxd
    ), scored AS (
      SELECT NTILE(3) OVER (ORDER BY recency_days, o_custkey) AS r,
             NTILE(3) OVER (ORDER BY frequency, o_custkey) AS f,
             NTILE(3) OVER (ORDER BY monetary, o_custkey) AS m
      FROM rfm
    )
    SELECT 'R' || r || 'F' || f || 'M' || m AS segment,
           CAST(COUNT(*) AS INT) AS n_customers
    FROM scored GROUP BY 1
    """,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order vs corpus max
    date), frequency, and exact-cents monetary per customer, each split
    into terciles with deterministic (value, custkey) order, concatenated
    into the classic R#F#M# segment labels with headcounts. One
    customer-keyed agg + three chained two-phase NTILEs over the
    customer-sized table (operators/ranking.py — three parallel range
    shuffles, never a single-partition window, since customers scale
    with the corpus) — the whole-corpus max date is a 1-row broadcast."""
    from ..operators.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    rfm = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.datediff("maxd", F.max("o_orderdate")).cast("bigint").alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(cents).alias("monetary"),
        )
    )
    scored = rfm
    for col, out in (("recency_days", "r"), ("frequency", "f"),
                     ("monetary", "m")):
        scored = attach_global_order_stats(
            scored, [(col, "asc"), ("o_custkey", "asc")], ntile=(3, out)
        )
    scored = scored.select("r", "f", "m")
    return (
        scored.select(
            F.concat(F.lit("R"), "r", F.lit("F"), "f", F.lit("M"), "m").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").cast("int").alias("n_customers"))
    )


@query(
    "agg_monthly_revenue_yoy",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo, ROUND(cents / 100.0, 2) AS revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / LAG(cents, 12) OVER (ORDER BY yr, mo) - 1.0, 6) AS yoy_growth
    FROM m
    """,
)
def agg_monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth (lag-12 over the month
    series) — the BI trend staple. Exact integer cents per month; the
    growth window runs over the MONTH-sized table (never the orders), and
    the first year's rows carry NULL growth by construction."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(F.sum(cents).alias("cents"))
    w = Window.orderBy("yr", "mo")
    return m.select(
        "yr", "mo",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(
            F.col("cents").cast("double") / F.lag("cents", 12).over(w) - 1.0, 6
        ).alias("yoy_growth"),
    )


@query(
    "agg_part_abc_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cents) OVER () AS tot
      FROM rev
    ), classed AS (
      SELECT CASE WHEN cum <= 0.8 * tot THEN 'A'
                  WHEN cum <= 0.95 * tot THEN 'B'
                  ELSE 'C' END AS abc_class, cents
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS INT) AS n_parts,
           ROUND(SUM(cents) / 100.0, 2) AS revenue
    FROM classed GROUP BY abc_class
    """,
)
def agg_part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of parts by revenue: A = parts inside
    the first 80% of cumulative revenue (ranked descending), B to 95%,
    C the tail — the inventory-policy classifier. Exact cents per part;
    the cumulative revenue walk over the PART dimension (which scales
    with the corpus) runs as the two-phase distributed prefix sum
    (operators/ranking.py — range partition on (revenue desc, partkey),
    per-partition totals, broadcast offsets), and the grand total is a
    1-row broadcast; class thresholds compare exact integers against
    0.8/0.95 of an exact integer total."""
    from ..operators.ranking import attach_global_order_stats

    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    rev = l.groupBy("l_partkey").agg(F.sum(cents).alias("cents"))
    tot = rev.agg(F.sum("cents").alias("tot"))
    ranked = attach_global_order_stats(
        rev,
        [("cents", "desc"), ("l_partkey", "asc")],
        cumsum=("cents", "cum"),
    ).crossJoin(F.broadcast(tot)).select("cents", "cum", "tot")
    cls = (
        F.when(F.col("cum") <= 0.8 * F.col("tot"), "A")
        .when(F.col("cum") <= 0.95 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("abc_class"), "cents")
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("int").alias("n_parts"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
    )


@query(
    "quality_constraint_report",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS rule,
             CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT) AS n_violations
      FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'lineitem_fk_orders',
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'orders_custkey_not_null',
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders_totalprice_positive',
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders_status_in_set',
             CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_discount_range',
             CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT)
      FROM lineitem
    )
    """,
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-contract report: violation counts for the table suite's
    core invariants — PK uniqueness, lineitem→orders referential
    integrity, null-freedom, value ranges, enum membership
    (operators/constraints.py). Scan-sharing by construction: the three
    orders row-rules evaluate in ONE aggregate over one scan; uniqueness
    is one keyed agg; the FK check is a broadcast anti-join. The report a
    pipeline gates promotion on — and everything is an exact integer, so
    the oracle checks it row for row."""
    from ..operators import constraints as C

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    uniq = C.unique_violations(o, ["o_orderkey"]).select(
        F.lit("orders_pk_unique").alias("rule"), F.col("n").alias("n_violations")
    )
    fk = C.foreign_key_violations(l, "l_orderkey", o, "o_orderkey").select(
        F.lit("lineitem_fk_orders").alias("rule"), F.col("n").alias("n_violations")
    )
    orders_rules = o.agg(
        C.violations_not_null(o, "o_custkey").alias("nn"),
        C.violations_predicate(o, F.col("o_totalprice") > 0).alias("pos"),
        C.violations_predicate(
            o, F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("st"),
    )
    o3 = orders_rules.selectExpr(
        "stack(3, 'orders_custkey_not_null', nn, "
        "'orders_totalprice_positive', pos, "
        "'orders_status_in_set', st) AS (rule, n_violations)"
    )
    disc = l.agg(
        C.violations_predicate(l, F.col("l_discount").between(0.0, 0.1)).alias("n")
    ).select(
        F.lit("lineitem_discount_range").alias("rule"),
        F.col("n").alias("n_violations"),
    )
    return uniq.unionByName(fk).unionByName(o3).unionByName(disc)


@query(
    "source_python_datasource",
    oracle="""
    WITH src AS (
      SELECT i.i AS id,
             CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM UNNEST(range(0, 1000)) AS i(i)
    )
    SELECT CAST(h % 10 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(h) AS BIGINT) AS max_h
    FROM src GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows produced by a CUSTOM CONNECTOR written against Spark 4's
    Python DataSource API (sources/pydatasource.py::HashRangeDataSource:
    schema + partition planning + per-partition readers, all pure Python)
    and aggregated per hash bucket. The connector's output is a pure
    function of its options — the portable md5 hash again — so even the
    extensibility surface is value-oracled: DuckDB reproduces what the
    8-split parallel read must yield. The reference's answer to a new
    source is another hand-rolled Java consumer; here a source is ~40
    lines of Python and the engine owns scheduling."""
    from ..sources.pydatasource import HashRangeDataSource

    try:
        spark.dataSource.register(HashRangeDataSource)
    except Exception:
        pass  # already registered in this session
    src = (
        spark.read.format("hashrange")
        .option("n", "1000")
        .option("parts", "8")
        .load()
    )
    return src.groupBy((F.col("h") % 10).alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("id").alias("min_id"),
        F.max("h").alias("max_h"),
    )


@query(
    "merge_scd2_version_diff",
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
    ), merged AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE d.valid_to END AS valid_to
      FROM dim d LEFT JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, 1, CAST(NULL AS INT)
      FROM updates u JOIN changed c USING (c_custkey)
    ), v0 AS (
      SELECT c_custkey, c_mktsegment FROM merged
      WHERE valid_from <= 0 AND (valid_to IS NULL OR valid_to > 0)
    ), v1 AS (
      SELECT c_custkey, c_mktsegment FROM merged
      WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)
    )
    SELECT v0.c_custkey,
           v0.c_mktsegment AS segment_v0,
           v1.c_mktsegment AS segment_v1
    FROM v0 JOIN v1 USING (c_custkey)
    WHERE v0.c_mktsegment <> v1.c_mktsegment
    """,
)
def merge_scd2_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit diff between two dimension VERSIONS: which keys changed
    between the as-of-0 and as-of-1 snapshots, with before/after values —
    the change report a warehouse review reads after every CDC
    promotion, and the third member of the SCD2 trio (merge = write,
    snapshot = read-as-of, diff = compare-two-reads). Two validity-
    interval filters over ONE maintained table (each a pushed scan
    predicate on a materialized dimension) joined on the key; at scale
    the join is key-partitioned and the unchanged majority drops in the
    filter, so the diff is change-sized, not dimension-sized."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey", "c_mktsegment",
        F.lit(0).alias("valid_from"), F.lit(None).cast("int").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("RELOCATED").alias("c_mktsegment")
    )
    merged = scd2_apply(dim, updates, "c_custkey", ["c_mktsegment"], new_version=1)

    def snap(asof: int) -> DataFrame:
        return merged.filter(
            (F.col("valid_from") <= asof)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
        ).select("c_custkey", "c_mktsegment")

    v0 = snap(0).withColumnRenamed("c_mktsegment", "segment_v0")
    v1 = snap(1).withColumnRenamed("c_mktsegment", "segment_v1")
    return v0.join(v1, "c_custkey").filter(
        F.col("segment_v0") != F.col("segment_v1")
    )


@query(
    "join_salted_orders_customers",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer executed through the EXPLICIT salt-sharding
    operator (operators/skew.py::salted_join: fact keys sharded into 16
    synthetic salts, dimension replicated 16×) and rolled up per segment.
    Salting must be a pure PHYSICAL transform — the oracle states the
    plain join, so this row proves result-equivalence, not just shape.
    This is the fallback for the pathological key AQE's skew-split can't
    fix (one join key too hot for a single task even after splitting);
    for ordinary skew the diag_key_skew dashboard + AQE settings in
    session.py are the first line."""
    from ..operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(
        o.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
        c,
        "c_custkey",
        n_salts=16,
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


@query(
    "merge_scd2_insert_new_keys",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment, 0 AS valid_from,
             CAST(NULL AS INT) AS valid_to
      FROM customer
    ), updates AS (
      SELECT c_custkey, 'RELOCATED' AS c_mktsegment
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT -c_custkey AS c_custkey, 'FRESH' AS c_mktsegment
      FROM customer WHERE c_custkey % 100 = 1
    ), changed AS (
      SELECT d.c_custkey FROM dim d JOIN updates u USING (c_custkey)
      WHERE d.valid_to IS NULL AND d.c_mktsegment <> u.c_mktsegment
    ), inserted AS (
      SELECT u.c_custkey, u.c_mktsegment
      FROM updates u LEFT JOIN dim d ON d.c_custkey = u.c_custkey
      WHERE d.c_custkey IS NULL
    )
    SELECT c_custkey, c_mktsegment, valid_from, valid_to FROM (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
             CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE d.valid_to END AS valid_to
      FROM dim d LEFT JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, 1, CAST(NULL AS INT)
      FROM updates u JOIN changed c USING (c_custkey)
      UNION ALL
      SELECT i.c_custkey, i.c_mktsegment, 1, CAST(NULL AS INT)
      FROM inserted i
    )
    """,
)
def merge_scd2_insert_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 upsert whose batch mixes CHANGES (every 13th customer
    re-segmented) with BRAND-NEW keys (negated custkeys absent from the
    dimension) — pins the round-4 advisor fix (operators/merge.py insert
    branch): a key with no current row must be INSERTED as a fresh open
    row at the new version, not silently dropped by the changed-keys
    inner join. Same no-hint, dimension-never-shuffles plan as
    merge_scd2_customers."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey", "c_mktsegment",
        F.lit(0).alias("valid_from"), F.lit(None).cast("int").alias("valid_to"),
    )
    changed = c.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey", F.lit("RELOCATED").alias("c_mktsegment")
    )
    new_keys = c.filter(F.col("c_custkey") % 100 == 1).select(
        (-F.col("c_custkey")).alias("c_custkey"),
        F.lit("FRESH").alias("c_mktsegment"),
    )
    return scd2_apply(
        dim, changed.unionByName(new_keys), "c_custkey", ["c_mktsegment"],
        new_version=1,
    )


@query(
    "merge_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, 1 AS seq, 'I' AS op,
             o_totalprice AS price, o_orderstatus AS status
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 10.0, 'U'
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 7 = 0
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY seq DESC) AS rn
      FROM log
    )
    SELECT o_orderkey, CAST(seq AS INT) AS seq, op, price, status
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES (operators/merge.py::cdc_apply): collapse an
    insert/update/delete change log into final table state — the
    generalization of the reference's upsert leg
    (MySQLProcessData.java:67-73) to a log with explicit deletes. The log
    here is derived deterministically from orders (every key inserted,
    every 3rd updated, every 7th deleted) so the oracle can replay it.
    Plan: ONE keyed max_by aggregation (map-side combinable — a window
    row_number would sort-shuffle log-sized) + the delete filter."""
    o = load_table(spark, sf_dir, "orders")
    ins = o.select(
        "o_orderkey",
        F.lit(1).cast("int").alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit(2).cast("int").alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("price"),
        F.lit("U").alias("status"),
    )
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit(3).cast("int").alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("status"),
    )
    log = ins.unionByName(upd).unionByName(dels)
    return merge.cdc_apply(log, ["o_orderkey"], seq_col="seq", op_col="op")


@query(
    "merge_view_maintenance",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 <> 0
    GROUP BY 1
    """,
)
def merge_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/merge.py::incremental_agg_apply): a stored per-status
    COUNT/SUM aggregate (base = orders with key%5≠0) absorbs a signed
    change stream (inserts: key%5=0; deletes: base keys with key%7=0)
    WITHOUT rescanning the base facts — delta aggregates first (map-side
    combined), one full-outer join against the stored agg. The oracle
    recomputes the final view directly from the merged state, proving the
    incremental fold lands on the exact same numbers."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    base_agg = base.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("cnt"),
        F.sum("o_totalprice").alias("sum_price"),
    )
    ins = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("sign"),
        F.col("o_totalprice").alias("sum_price"),
    )
    dels = base.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(-1).alias("sign"),
        F.col("o_totalprice").alias("sum_price"),
    )
    out = merge.incremental_agg_apply(
        base_agg,
        ins.unionByName(dels),
        ["status"],
        count_col="cnt",
        sum_cols=["sum_price"],
    )
    return out.select(
        "status",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round("sum_price", 2).alias("sum_price"),
    )


@query(
    "merge_ivm_minmax",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(ROUND(MIN(o_totalprice) * 100, 0) AS BIGINT) AS min_cents,
           CAST(ROUND(MAX(o_totalprice) * 100, 0) AS BIGINT) AS max_cents
    FROM orders
    WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 <> 0
    GROUP BY 1
    """,
)
def merge_ivm_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MIN/MAX view maintenance — the aggregate family
    merge_view_maintenance documented as out of scope, now closed
    (operators/merge.py::incremental_minmax_apply): inserts update the
    bounds algebraically; deletes mark a group dirty ONLY when the
    deleted values can touch the stored bound, and dirty groups — alone —
    recompute from the post-merge fact table via a left-semi-pruned
    rescan. Same base/delta slices as the COUNT/SUM row (base =
    key%5≠0, inserts = key%5=0, deletes = base keys with key%7=0), so
    the two IVM rows are directly comparable; the oracle recomputes the
    final (cnt, min, max) per status from scratch, proving the
    incremental path — algebraic branch AND pruned-rescan branch — lands
    on identical numbers. At 100 TB the rescan volume is the dirty
    groups' rows only."""
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    base_agg = base.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    ins = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(1).alias("sign"),
        F.col("o_totalprice").alias("price"),
    )
    dels = base.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(-1).alias("sign"),
        F.col("o_totalprice").alias("price"),
    )
    facts_after = o.filter(
        (F.col("o_orderkey") % 5 == 0) | (F.col("o_orderkey") % 7 != 0)
    ).select(F.col("o_orderstatus").alias("status"),
             F.col("o_totalprice").alias("price"))
    out = merge.incremental_minmax_apply(
        base_agg,
        ins.unionByName(dels),
        facts_after,
        ["status"],
        "price",
    )
    return out.select(
        "status",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(F.col("mn") * 100, 0).cast("bigint").alias("min_cents"),
        F.round(F.col("mx") * 100, 0).cast("bigint").alias("max_cents"),
    )


@query(
    "merge_deletion_vectors",
    oracle="""
    WITH files AS (
      SELECT o_orderkey // 1024 AS file_id,
             CASE WHEN o_orderstatus = 'F'
                    AND year(o_orderdate) <= 1993
                  THEN 1 ELSE 0 END AS del
      FROM orders
    ), dv AS (
      SELECT file_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(del) AS BIGINT) AS n_deleted
      FROM files GROUP BY file_id
    )
    SELECT file_id, n_rows, n_deleted,
           ROUND(CAST(n_deleted AS DOUBLE) / n_rows, 6) AS dv_density,
           CAST(n_deleted = n_rows AS BOOLEAN) AS fully_dead,
           CAST(n_deleted > 0 AND n_deleted < n_rows
                AND n_deleted * 10 > n_rows * 3 AS BOOLEAN)
             AS rewrite_recommended
    FROM dv
    """,
)
def merge_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION-VECTOR maintenance report — the merge-on-read bookkeeping
    every modern lakehouse (Delta DVs, Iceberg positional deletes) runs
    instead of rewriting files on DELETE: for a retention predicate
    (finished orders through 1993), each simulated 1024-row file's DV
    cardinality, density, fully-dead flag (drop the file, no DV needed),
    and the rewrite recommendation once DVs exceed 30% of the file (the
    read-amplification threshold where compaction beats masking — the
    integer cross-multiplied form keeps the 0.3 comparison exact). One
    file-keyed agg over a projection; the report is file-list-sized, the
    same metadata-scale shape as layout_compaction_bins and
    layout_zonemap_pruning."""
    o = load_table(spark, sf_dir, "orders")
    files = o.select(
        (F.col("o_orderkey") / 1024).cast("bigint").alias("file_id"),
        F.when(
            (F.col("o_orderstatus") == "F")
            & (F.year("o_orderdate") <= 1993),
            1,
        ).otherwise(0).alias("del"),
    )
    dv = files.groupBy("file_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("del").cast("bigint").alias("n_deleted"),
    )
    return dv.select(
        "file_id",
        "n_rows",
        "n_deleted",
        F.round(F.col("n_deleted").cast("double") / F.col("n_rows"), 6)
        .alias("dv_density"),
        (F.col("n_deleted") == F.col("n_rows")).alias("fully_dead"),
        (
            (F.col("n_deleted") > 0)
            & (F.col("n_deleted") < F.col("n_rows"))
            & (F.col("n_deleted") * 10 > F.col("n_rows") * 3)
        ).alias("rewrite_recommended"),
    )


@query(
    "merge_insert_overwrite_partitions",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice,
             date_trunc('month', o_orderdate) AS mon
      FROM orders
    ), batch AS (
      SELECT o_orderkey, ROUND(o_totalprice * 1.1, 2) AS o_totalprice, mon
      FROM base
      WHERE mon BETWEEN DATE '1994-07-01' AND DATE '1994-12-01'
        AND o_orderkey % 2 = 1
    ), touched AS (
      SELECT DISTINCT mon FROM batch
    ), merged AS (
      SELECT * FROM base WHERE mon NOT IN (SELECT mon FROM touched)
      UNION ALL
      SELECT * FROM batch
    )
    SELECT CAST(mon AS DATE) AS mon,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM merged
    WHERE mon BETWEEN DATE '1994-01-01' AND DATE '1995-06-01'
    GROUP BY 1
    """,
)
def merge_insert_overwrite_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE (INSERT OVERWRITE ... PARTITION — the
    lakehouse restatement primitive): a correction batch (1994-H2 months,
    odd orderkeys, prices restated +10%) REPLACES exactly the month
    partitions it contains rows for; untouched partitions pass through
    byte-identical. Spark's own writer does this under
    spark.sql.sources.partitionOverwriteMode=dynamic — here the semantics
    are expressed relationally so the oracle can check them: touched
    months are a tiny DISTINCT (broadcast anti-join, so the base table is
    ONE scan with a pushed filter — partition pruning at real scale),
    batch rows union in. Output is the per-month audit (row count + exact
    cents) over the seam months: the restated months must show only odd
    keys at +10 %, the neighbors must be untouched — any leakage of the
    overwrite across partition boundaries breaks the hash."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").alias("mon"),
    )
    batch = base.filter(
        F.col("mon").between("1994-07-01", "1994-12-01")
        & (F.col("o_orderkey") % 2 == 1)
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        "mon",
    )
    touched = batch.select("mon").distinct()
    merged = base.join(F.broadcast(touched), "mon", "left_anti").unionByName(
        batch.select("o_orderkey", "o_totalprice", "mon")
    )
    return (
        merged.filter(F.col("mon").between("1994-01-01", "1995-06-01"))
        .groupBy(F.col("mon").cast("date").alias("mon"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("cents"),
        )
    )


@query(
    "merge_snapshot_column_drift",
    oracle="""
    WITH cur AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
    ), snap AS (
      -- deterministic restated snapshot: %97 keys deleted, %7 keys change
      -- segment, %11 keys get a 500-cent credit, %101 keys reappear as
      -- fresh ids in a new key range
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'RELOCATED'
                  ELSE c_mktsegment END AS c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
               + CASE WHEN c_custkey % 11 = 0 THEN 500 ELSE 0 END AS bal_cents
      FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer),
             c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
      FROM customer WHERE c_custkey % 101 = 0
    ), j AS (
      SELECT cur.c_custkey AS k_cur, snap.c_custkey AS k_snap,
             cur.c_mktsegment AS seg_cur, snap.c_mktsegment AS seg_snap,
             cur.bal_cents AS bal_cur, snap.bal_cents AS bal_snap
      FROM cur FULL OUTER JOIN snap ON cur.c_custkey = snap.c_custkey
    )
    SELECT metric, n FROM (
      SELECT 'rows_added' AS metric,
             CAST(SUM(CASE WHEN k_cur IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM j
      UNION ALL
      SELECT 'rows_removed',
             CAST(SUM(CASE WHEN k_snap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
      UNION ALL
      SELECT 'rows_matched',
             CAST(SUM(CASE WHEN k_cur IS NOT NULL AND k_snap IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
      UNION ALL
      SELECT 'changed_c_mktsegment',
             CAST(SUM(CASE WHEN k_cur IS NOT NULL AND k_snap IS NOT NULL
                            AND seg_cur <> seg_snap THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
      UNION ALL
      SELECT 'changed_c_acctbal',
             CAST(SUM(CASE WHEN k_cur IS NOT NULL AND k_snap IS NOT NULL
                            AND bal_cur <> bal_snap THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
      UNION ALL
      SELECT 'changed_any_column',
             CAST(SUM(CASE WHEN k_cur IS NOT NULL AND k_snap IS NOT NULL
                            AND (seg_cur <> seg_snap OR bal_cur <> bal_snap)
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM j
    )
    """,
)
def merge_snapshot_column_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT RECONCILIATION AUDIT — the table-diff report every
    migration/backfill review reads before swapping a restated snapshot
    in: rows added, rows removed, rows matched, and PER-COLUMN change
    counts between the current table and a deterministic restatement
    (segment rewrites, balance credits, deletions, new keys offset past MAX(key) so they stay collision-free at any scale). One full
    outer join on the key feeding six conditional counts in a single
    map-side-combined pass (the unpivot to (metric, n) rows is on the
    6-row aggregate, not the data); balances compare as exact integer
    cents so float noise can't masquerade as drift. At 100 TB both
    sides shuffle once on the join key — the same plan DeequalDiff-style
    reconcilers run."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
    cur = c.select("c_custkey", "c_mktsegment", cents.alias("bal_cents"))
    snap = (
        c.where(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, "RELOCATED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            (
                cents
                + F.when(F.col("c_custkey") % 11 == 0, 500).otherwise(0)
            ).cast("bigint").alias("bal_cents"),
        )
        .unionByName(
            # fresh-key offset derives from MAX(c_custkey)+1 (a 1-row
            # broadcast aggregate) so synthetic ids can NEVER collide with
            # real ones at any table size — a fixed +1e6 offset would fan
            # out the full outer join past ~1M customers
            c.where(F.col("c_custkey") % 101 == 0)
            .crossJoin(
                F.broadcast(c.agg((F.max("c_custkey") + 1).alias("__off")))
            )
            .select(
                (F.col("c_custkey") + F.col("__off")).alias("c_custkey"),
                "c_mktsegment",
                cents.alias("bal_cents"),
            )
        )
    )
    j = cur.alias("a").join(
        snap.alias("b"), F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer"
    ).select(
        F.col("a.c_custkey").alias("k_cur"),
        F.col("b.c_custkey").alias("k_snap"),
        F.col("a.c_mktsegment").alias("seg_cur"),
        F.col("b.c_mktsegment").alias("seg_snap"),
        F.col("a.bal_cents").alias("bal_cur"),
        F.col("b.bal_cents").alias("bal_snap"),
    )
    matched = F.col("k_cur").isNotNull() & F.col("k_snap").isNotNull()
    agg = j.agg(
        F.sum(F.when(F.col("k_cur").isNull(), 1).otherwise(0)).cast("bigint").alias("rows_added"),
        F.sum(F.when(F.col("k_snap").isNull(), 1).otherwise(0)).cast("bigint").alias("rows_removed"),
        F.sum(F.when(matched, 1).otherwise(0)).cast("bigint").alias("rows_matched"),
        F.sum(F.when(matched & (F.col("seg_cur") != F.col("seg_snap")), 1).otherwise(0)).cast("bigint").alias("changed_c_mktsegment"),
        F.sum(F.when(matched & (F.col("bal_cur") != F.col("bal_snap")), 1).otherwise(0)).cast("bigint").alias("changed_c_acctbal"),
        F.sum(
            F.when(
                matched
                & (
                    (F.col("seg_cur") != F.col("seg_snap"))
                    | (F.col("bal_cur") != F.col("bal_snap"))
                ),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("changed_any_column"),
    )
    return agg.selectExpr(
        "stack(6, 'rows_added', rows_added, 'rows_removed', rows_removed, "
        "'rows_matched', rows_matched, "
        "'changed_c_mktsegment', changed_c_mktsegment, "
        "'changed_c_acctbal', changed_c_acctbal, "
        "'changed_any_column', changed_any_column) AS (metric, n)"
    )
