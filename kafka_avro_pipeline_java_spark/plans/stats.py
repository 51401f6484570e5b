"""Statistical-test round-out: lag-1 revenue autocorrelation, the Benford
first-digit audit, and the Mann–Whitney U rank test.

These finish the hypothesis-testing shelf next to stats_chi2_type_hour
(events3) and stats_welch_t_sources (text4): autocorrelation is the
seasonality probe behind every forecast sanity check, Benford's law is
the classic synthetic/fabricated-amounts detector (a generated revenue
column that fails Benford is a red flag on an ingestion source), and
Mann–Whitney is the nonparametric two-sample test you reach for when the
Welch t's normality assumption is off.

Determinism discipline (same as stats_welch_t_sources): every statistic
is closed-form algebra over INTEGER-EXACT quantized sums (cents /
thousands-of-dollars BIGINTs), so Spark and DuckDB compute identical
doubles and the driver's value hash compares equal — no reliance on the
engines' corr()/stddev() accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query


@query(
    "stats_autocorr_revenue",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                        / 100000.0, 0) AS BIGINT) AS rev_k
      FROM orders GROUP BY 1
    ), lagged AS (
      SELECT rev_k AS y,
             LAG(rev_k) OVER (ORDER BY mon) AS x
      FROM m
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM lagged WHERE x IS NOT NULL
    )
    SELECT n AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS lag1_autocorr
    FROM s
    """,
)
def stats_autocorr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of monthly order revenue — the "is there
    month-over-month momentum / seasonality" probe under the Holt
    forecasting twin (events_holt_trend_forecast). Monthly sums quantize
    to exact integer thousands-of-dollars (cents-BIGINT sum first, so
    the quantization itself is order-independent), then Pearson r over
    the (rev, lag(rev)) pairs in closed form from six integer-exact
    sums — identical doubles on both engines. The month rollup is one
    keyed agg; the lag window runs over ~80 month rows (driver-size,
    not data-size)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.round(F.sum(cents) / 100000.0, 0).cast("bigint").alias("rev_k")
        )
    )
    lagged = m.select(
        F.col("rev_k").alias("y"),
        F.lag("rev_k").over(Window.orderBy("mon")).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = lagged.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt(
        (n * F.col("sxx") - sx * sx).cast("double")
        * (n * F.col("syy") - sy * sy).cast("double")
    )
    return s.select(
        n.alias("n_pairs"), F.round(num / den, 6).alias("lag1_autocorr")
    )


@query(
    "stats_benford_price",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ), c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    )
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS obs_freq,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_freq
    FROM c
    """,
)
def stats_benford_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of o_totalprice: observed first-
    significant-digit frequencies next to the Benford expectation
    log10(1 + 1/d) — the fabricated-amounts detector every financial /
    synthetic-data audit runs. The digit comes from the STRING head of
    FLOOR(price) (both engines truncate identically; no float-log10
    digit extraction that could disagree at exact powers of ten), so the
    grouping is exact; the frequency is one 9-row window over the digit
    counts. One scan, one 9-group agg — fully scan-bound at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy()
    return c.select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
            "obs_freq"
        ),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_freq"),
    )


@query(
    "stats_mann_whitney_u",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), cnt AS (
      SELECT v, CAST(SUM(ga) AS BIGINT) AS na_v,
             CAST(SUM(1 - ga) AS BIGINT) AS nb_v
      FROM vals GROUP BY v
    ), w AS (
      SELECT na_v, nb_v,
             CAST(COALESCE(SUM(nb_v) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cumb
      FROM cnt
    ), s AS (
      SELECT CAST(SUM(na_v) AS BIGINT) AS na,
             CAST(SUM(nb_v) AS BIGINT) AS nb,
             CAST(2 * SUM(na_v * cumb) + SUM(na_v * nb_v) AS BIGINT) AS u2,
             CAST(SUM((na_v + nb_v) * (na_v + nb_v) * (na_v + nb_v)
                      - (na_v + nb_v)) AS BIGINT) AS tsum
      FROM w
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(u2 AS DOUBLE) / 2 AS u_stat,
           ROUND((CAST(u2 AS DOUBLE) / 2 - CAST(na * nb AS DOUBLE) / 2)
                 / SQRT(CAST(na * nb AS DOUBLE) / 12
                        * ((na + nb + 1)
                           - CAST(tsum AS DOUBLE)
                             / ((na + nb) * (na + nb - 1.0)))), 6)
             AS z_score
    FROM s
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test: do URGENT and LOW priority orders
    draw o_totalprice from the same distribution? U counts
    (a > b) pairs + half the ties WITHOUT ranking rows: group to
    distinct cent values with per-group (n_urgent, n_low) counts, then a
    running sum of n_low over the value order gives each value's
    "b's below me" — U = Σ na_v·cumb_v + ½·Σ na_v·nb_v, kept as the
    integer 2U so every term is exact BIGINT algebra; the normal-approx
    z uses the closed-form moments WITH the standard tie correction
    σ² = na·nb/12 · ((n+1) − Σ(t³−t)/(n·(n−1))) — cent-quantized prices
    do tie, and the uncorrected variance would bias |z| low. Σ(t³−t) is
    one more exact-BIGINT sum over the per-value counts already grouped. The only ordered pass is the window
    over DISTINCT values (≈30k rows at sf0.1, value-domain-bounded —
    the two-phase per-partition prefix-sum of operators/packing.py is
    the drop-in at 100 TB). Same pair-counting idea as the
    inverted-index dedup family: never materialize the n_a×n_b pairs."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    ga = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    vals = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
        ga.alias("ga"),
    )
    cnt = vals.groupBy("v").agg(
        F.sum("ga").cast("bigint").alias("na_v"),
        F.sum(1 - F.col("ga")).cast("bigint").alias("nb_v"),
    )
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cnt.select(
        "na_v",
        "nb_v",
        F.coalesce(F.sum("nb_v").over(w), F.lit(0)).cast("bigint").alias(
            "cumb"
        ),
    )
    t = F.col("na_v") + F.col("nb_v")
    s = ranked.agg(
        F.sum("na_v").cast("bigint").alias("na"),
        F.sum("nb_v").cast("bigint").alias("nb"),
        (
            2 * F.sum(F.col("na_v") * F.col("cumb"))
            + F.sum(F.col("na_v") * F.col("nb_v"))
        ).cast("bigint").alias("u2"),
        # tie correction term Σ(t³−t) over tie groups — exact BIGINT
        # (cent-quantized prices DO tie, so the no-ties variance would
        # overstate σ and bias |z| low)
        F.sum(t * t * t - t).cast("bigint").alias("tsum"),
    )
    na, nb, u2 = F.col("na"), F.col("nb"), F.col("u2")
    u = u2.cast("double") / 2
    mu = (na * nb).cast("double") / 2
    n = na + nb
    sigma = F.sqrt(
        (na * nb).cast("double") / 12
        * ((n + 1) - F.col("tsum").cast("double") / (n * (n - F.lit(1.0))))
    )
    return s.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        u.alias("u_stat"),
        F.round((u - mu) / sigma, 6).alias("z_score"),
    )


@query(
    "stats_ks_two_sample",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), cnt AS (
      SELECT v, CAST(SUM(ga) AS BIGINT) AS na_v,
             CAST(SUM(1 - ga) AS BIGINT) AS nb_v
      FROM vals GROUP BY v
    ), cum AS (
      SELECT CAST(SUM(na_v) OVER (ORDER BY v) AS BIGINT) AS ca,
             CAST(SUM(nb_v) OVER (ORDER BY v) AS BIGINT) AS cb
      FROM cnt
    ), tot AS (
      SELECT CAST(SUM(na_v) AS BIGINT) AS na,
             CAST(SUM(nb_v) AS BIGINT) AS nb
      FROM cnt
    ), d AS (
      SELECT CAST(MAX(ABS(ca * (SELECT nb FROM tot)
                          - cb * (SELECT na FROM tot))) AS BIGINT) AS dnum
      FROM cum
    )
    SELECT na AS n_a, nb AS n_b,
           ROUND(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6)
             AS d_stat,
           ROUND(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
                 * SQRT(CAST(na AS DOUBLE) * nb / (na + nb)), 6)
             AS ks_lambda,
           ROUND(2 * EXP(-2 * POW(CAST(dnum AS DOUBLE)
                                  / (CAST(na AS DOUBLE) * nb), 2)
                         * (CAST(na AS DOUBLE) * nb / (na + nb))), 6)
             AS p_one_term
    FROM d, tot
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample test: max CDF gap between URGENT and
    LOW priority o_totalprice — the distribution-shape complement to
    stats_mann_whitney_u's location test (KS sees variance/shape shifts
    a rank-sum misses). D is kept as the exact BIGINT numerator
    max|ca·nb − cb·na| over the cumulative per-value counts, divided
    once at the end, so both engines derive identical doubles;
    p_one_term is the leading term 2·exp(−2λ²) of the Smirnov series
    (the full alternating series is a driver-side refinement — the
    sorted-values scan is the distributed work). One window over
    DISTINCT cent values, same value-domain-bounded ordered pass as the
    U test."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    ga = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    vals = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
        ga.alias("ga"),
    )
    cnt = vals.groupBy("v").agg(
        F.sum("ga").cast("bigint").alias("na_v"),
        F.sum(1 - F.col("ga")).cast("bigint").alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cnt.select(
        F.sum("na_v").over(w).cast("bigint").alias("ca"),
        F.sum("nb_v").over(w).cast("bigint").alias("cb"),
    )
    tot = cnt.agg(
        F.sum("na_v").cast("bigint").alias("na"),
        F.sum("nb_v").cast("bigint").alias("nb"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
            ).cast("bigint").alias("dnum"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    dstat = F.col("dnum").cast("double") / (na_d * nb_d)
    eff = na_d * nb_d / (na_d + nb_d)
    return d.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(dstat, 6).alias("d_stat"),
        F.round(dstat * F.sqrt(eff), 6).alias("ks_lambda"),
        F.round(2 * F.exp(-2 * F.pow(dstat, 2) * eff), 6).alias(
            "p_one_term"
        ),
    )


@query(
    "stats_spearman_corr",
    oracle="""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS qa,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS vb
      FROM lineitem
    ), ra AS (
      SELECT qa, 2 * COALESCE(SUM(t) OVER (
               ORDER BY qa ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + t + 1 AS da
      FROM (SELECT qa, COUNT(*) AS t FROM li GROUP BY qa)
    ), rb AS (
      SELECT vb, 2 * COALESCE(SUM(t) OVER (
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + t + 1 AS db
      FROM (SELECT vb, COUNT(*) AS t FROM li GROUP BY vb)
    ), j AS (
      SELECT da, db FROM li JOIN ra USING (qa) JOIN rb USING (vb)
    ), s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(da) AS DOUBLE) AS sa, CAST(SUM(db) AS DOUBLE) AS sb,
             CAST(SUM(da * da) AS DOUBLE) AS saa,
             CAST(SUM(db * db) AS DOUBLE) AS sbb,
             CAST(SUM(da * db) AS DOUBLE) AS sab
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((n * sab - sa * sb)
                 / (SQRT(n * saa - sa * sa) * SQRT(n * sbb - sb * sb)), 6)
             AS rho
    FROM s
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_extendedprice:
    Pearson over tie-averaged ranks, with every rank DOUBLED so it stays
    an exact integer (the average rank of a tie run is a half-integer;
    2·rank = 2·cum_before + t + 1 is BIGINT). Ranks come from windows
    over DISTINCT values (value-domain-bounded, the U/KS pattern), are
    joined back to rows (the 50-value quantity side broadcasts), and the
    five moments are summed as decimal(38,0) — matching DuckDB's HUGEINT
    sum exactly even where Σ(2r)² would overflow int64 at sf≥1 — then
    cast once to double for the closed form, so both engines round
    identical values. The doubling cancels: Pearson is scale-invariant."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("qa"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("vb"),
    )

    def dranks(col: str, out: str) -> DataFrame:
        cnt = li.groupBy(col).agg(F.count("*").alias("t"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return cnt.select(
            col,
            (
                2 * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                + 1
            ).cast("bigint").alias(out),
        )

    j = li.join(F.broadcast(dranks("qa", "da")), "qa").join(
        dranks("vb", "db"), "vb"
    )
    dec = "decimal(38,0)"
    s = j.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("da").cast(dec)).alias("sa"),
        F.sum(F.col("db").cast(dec)).alias("sb"),
        F.sum((F.col("da") * F.col("da")).cast(dec)).alias("saa"),
        F.sum((F.col("db") * F.col("db")).cast(dec)).alias("sbb"),
        F.sum((F.col("da") * F.col("db")).cast(dec)).alias("sab"),
    )
    n = F.col("n_rows").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa, sbb = F.col("saa").cast("double"), F.col("sbb").cast("double")
    sab = F.col("sab").cast("double")
    return s.select(
        F.col("n_rows").alias("n"),
        F.round(
            (n * sab - sa * sb)
            / (
                F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
            ),
            6,
        ).alias("rho"),
    )


@query(
    "stats_pmi_priority_status",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    xy AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM orders GROUP BY 1, 2
    ),
    x AS (
      SELECT priority, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM xy GROUP BY 1
    ),
    y AS (
      SELECT status, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM xy GROUP BY 1
    )
    SELECT xy.priority, xy.status, xy.n_xy,
           ROUND(LN(CAST(xy.n_xy AS DOUBLE) * (SELECT n FROM n)
                    / (CAST(x.n_x AS DOUBLE) * y.n_y)), 6) AS pmi,
           ROUND(CAST(xy.n_xy AS DOUBLE) / (SELECT n FROM n)
                 * LN(CAST(xy.n_xy AS DOUBLE) * (SELECT n FROM n)
                      / (CAST(x.n_x AS DOUBLE) * y.n_y)), 9)
             AS mi_contrib
    FROM xy JOIN x USING (priority) JOIN y USING (status)
    """,
)
def stats_pmi_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between order priority and status —
    the dependence-structure audit (MI is what a feature-selection /
    leakage check computes between a candidate feature and the label).
    Emitted as the PER-CELL table (priority, status, n_xy, pmi,
    mi_contrib) rather than one summed MI scalar: each cell's value is a
    pure function of four exact integers, so both engines compute
    identical doubles per ROW and the driver hash-checks every cell —
    while a summed MI would re-introduce the cross-engine accumulation-
    order sensitivity this repo's stats family deliberately avoids
    (the reader gets MI by summing mi_contrib, and its error is bounded
    by 15 rounded cells). Contingency counts are one groupBy; the
    marginals re-aggregate the 15-cell table, not the corpus."""
    o = load_table(spark, sf_dir, "orders")
    xy = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count("*").cast("bigint").alias("n_xy"))
    x = xy.groupBy("priority").agg(
        F.sum("n_xy").cast("bigint").alias("n_x")
    )
    y = xy.groupBy("status").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    tot = xy.agg(F.sum("n_xy").cast("bigint").alias("n"))
    j = (
        xy.join(F.broadcast(x), "priority")
        .join(F.broadcast(y), "status")
        .crossJoin(F.broadcast(tot))
    )
    n_d = F.col("n").cast("double")
    ratio = (
        F.col("n_xy").cast("double")
        * n_d
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return j.select(
        "priority",
        "status",
        "n_xy",
        F.round(F.log(ratio), 6).alias("pmi"),
        F.round(
            F.col("n_xy").cast("double") / n_d * F.log(ratio),
            9,
        ).alias("mi_contrib"),
    )


@query(
    "stats_theil_sen_trend",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                        / 100000.0, 0) AS BIGINT) AS rev_k
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY mon) AS BIGINT) AS i, rev_k
      FROM m
    ), slopes AS (
      SELECT CAST(b.rev_k - a.rev_k AS DOUBLE) / (b.i - a.i) AS s,
             a.i AS ai, b.i AS bi
      FROM idx a JOIN idx b ON b.i > a.i
    ), ranked AS (
      SELECT s, ROW_NUMBER() OVER (ORDER BY s, ai, bi) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes
    ), sen AS (
      SELECT (SUM(CASE WHEN rn = (n + 1) // 2 THEN s ELSE 0 END)
              + SUM(CASE WHEN rn = (n + 2) // 2 THEN s ELSE 0 END)) / 2
               AS slope,
             CAST(MAX(n) AS BIGINT) AS n_pairs
      FROM ranked
    ), resid AS (
      SELECT idx.rev_k - sen.slope * idx.i AS r, idx.i,
             ROW_NUMBER() OVER (ORDER BY idx.rev_k - sen.slope * idx.i,
                                idx.i) AS rn,
             COUNT(*) OVER () AS n
      FROM idx, sen
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM idx) AS n_months,
           sen.n_pairs,
           ROUND(sen.slope, 6) AS sen_slope,
           ROUND((SELECT (SUM(CASE WHEN rn = (n + 1) // 2 THEN r ELSE 0 END)
                          + SUM(CASE WHEN rn = (n + 2) // 2 THEN r
                                ELSE 0 END)) / 2
                  FROM resid), 6) AS sen_intercept
    FROM sen
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes (and the median-residual intercept) — immune to the
    outlier months that swing the OLS line (agg_ols_qty_price's
    breakdown point is one bad point; Theil–Sen's is 29%). The pair
    join is month-domain bounded (n months → n(n−1)/2 ≈ 3k pairs at 80
    months — a century is ~720k pairs, still nothing), slopes are
    identical per-pair doubles from integer-quantized revenue, and both
    medians use the exact middle-two-rank selection with (value, i, j)
    tiebreaks, so the engines pick identical elements. One ordered pass
    over the slope list; no corpus-sized work beyond the month rollup."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.round(F.sum(cents) / 100000.0, 0).cast("bigint").alias("rev_k")
    )
    # r14: idx fed both slope-join sides, the residual pass and the month
    # count — four derivations of the corpus month rollup (12 parquet
    # scans); sen fed the residual pass and the final select — the whole
    # pairwise-slope median ran twice. Both are month-domain tables;
    # materialize each once (§2.4).
    idx = m.select(
        F.row_number().over(Window.orderBy("mon")).cast("bigint").alias("i"),
        "rev_k",
    ).localCheckpoint(eager=False)
    a = idx.select(F.col("i").alias("ai"), F.col("rev_k").alias("ra"))
    b = idx.select(F.col("i").alias("bi"), F.col("rev_k").alias("rb"))
    slopes = (
        a.crossJoin(b)
        .filter(F.col("bi") > F.col("ai"))
        .select(
            ((F.col("rb") - F.col("ra")).cast("double")
             / (F.col("bi") - F.col("ai"))).alias("s"),
            "ai",
            "bi",
        )
    )

    def median_double(df: DataFrame, col: str, *tiebreak: str):
        w = Window.orderBy(col, *tiebreak)
        ranked = df.select(
            col,
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        mid1 = F.floor((F.col("n") + 1) / 2)
        mid2 = F.floor((F.col("n") + 2) / 2)
        return ranked.agg(
            (
                (
                    F.sum(F.when(F.col("rn") == mid1, F.col(col)).otherwise(0.0))
                    + F.sum(F.when(F.col("rn") == mid2, F.col(col)).otherwise(0.0))
                ) / 2
            ).alias("med"),
            F.max("n").cast("bigint").alias("n_rows"),
        )

    sen = median_double(slopes, "s", "ai", "bi").select(
        F.col("med").alias("slope"), F.col("n_rows").alias("n_pairs")
    ).localCheckpoint(eager=False)
    resid = idx.crossJoin(F.broadcast(sen)).select(
        (F.col("rev_k") - F.col("slope") * F.col("i")).alias("r"),
        "i",
        "slope",
        "n_pairs",
    )
    icept = median_double(resid, "r", "i").select(
        F.col("med").alias("intercept")
    )
    n_months = idx.agg(F.count("*").cast("bigint").alias("n_months"))
    return (
        n_months.crossJoin(F.broadcast(sen))
        .crossJoin(F.broadcast(icept))
        .select(
            "n_months",
            "n_pairs",
            F.round("slope", 6).alias("sen_slope"),
            F.round("intercept", 6).alias("sen_intercept"),
        )
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), conc AS (
      SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS s
      FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y
    ), disc AS (
      SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS s
      FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y
    ), tots AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells
    ), tx AS (
      SELECT CAST(SUM(ct * (ct - 1) / 2) AS BIGINT) AS t
      FROM (SELECT SUM(c) AS ct FROM cells GROUP BY x)
    ), ty AS (
      SELECT CAST(SUM(ct * (ct - 1) / 2) AS BIGINT) AS t
      FROM (SELECT SUM(c) AS ct FROM cells GROUP BY y)
    )
    SELECT tots.n,
           conc.s AS concordant, disc.s AS discordant,
           ROUND((conc.s - disc.s)
                 / (SQRT(CAST(tots.n * (tots.n - 1) / 2 - tx.t AS DOUBLE))
                    * SQRT(CAST(tots.n * (tots.n - 1) / 2 - ty.t
                           AS DOUBLE))), 6) AS tau_b
    FROM conc, disc, tots, tx, ty
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between l_quantity and the cent-quantized l_discount —
    the third rank statistic next to Spearman (τ is the probability-of-
    concordance scale the other two lack). Never touches row pairs: both
    variables live on tiny integer domains (50 quantities × ~11 discount
    cents), so concordant/discordant PAIR COUNTS come from a cell×cell
    join over the |X|·|Y| CONTINGENCY table (≤ 550 cells — domain-sized,
    row-count-free), every term an exact BIGINT product; the tie terms
    use the marginals. One corpus scan for the contingency counts; at
    100 TB nothing downstream of that scan grows."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14: the ≤550-cell contingency table fed a, b (twice), tots, tx and
    # ty — six derivations of the corpus aggregate (14 parquet scans).
    # Materialize the domain-sized table once (§2.4).
    cells = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("y"),
    ).agg(F.count("*").cast("bigint").alias("c")).localCheckpoint(eager=False)
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    conc = (
        a.join(F.broadcast(b), (F.col("bx") > F.col("ax")) & (F.col("by") > F.col("ay")))
        .agg(F.sum(F.col("ac") * F.col("bc")).cast("bigint").alias("concordant"))
    )
    disc = (
        a.join(F.broadcast(b), (F.col("bx") > F.col("ax")) & (F.col("by") < F.col("ay")))
        .agg(F.sum(F.col("ac") * F.col("bc")).cast("bigint").alias("discordant"))
    )
    tots = cells.agg(F.sum("c").cast("bigint").alias("n"))
    tx = (
        cells.groupBy("x").agg(F.sum("c").alias("ct"))
        .agg(F.sum(F.col("ct") * (F.col("ct") - 1) / 2).cast("bigint").alias("tx"))
    )
    ty = (
        cells.groupBy("y").agg(F.sum("c").alias("ct"))
        .agg(F.sum(F.col("ct") * (F.col("ct") - 1) / 2).cast("bigint").alias("ty"))
    )
    j = (
        tots.crossJoin(F.broadcast(conc))
        .crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n = F.col("n")
    half = (n * (n - 1) / 2).cast("bigint")
    return j.select(
        "n",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / (
                F.sqrt((half - F.col("tx")).cast("double"))
                * F.sqrt((half - F.col("ty")).cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )
