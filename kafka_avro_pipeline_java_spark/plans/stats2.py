"""Round-8 statistical round-out: overdispersion, effect-size matrix,
quantized-log means, offline changepoint, a retention decay fit, the
log-rank / Kaplan–Meier survival pair, and the inequality shelf (Theil
decomposition, HHI, weighted median, categorical entropy).

Every statistic follows the repo's determinism discipline
(stats.py/stats.py docstrings): closed-form algebra over INTEGER-EXACT
sums. Where a statistic needs logarithms or reciprocals (geometric /
harmonic means, the log-linear decay fit), each term is quantized to a
BIGINT at 1e9 resolution on the BOUNDED value domain FIRST and the sums
run over integers — so Spark and DuckDB add identical integers in any
order and the final ROUND(...,6) doubles compare equal. No reliance on
either engine's float accumulation order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

_Q = 1_000_000_000  # 1e9 fixed-point quantization for log/reciprocal terms


@query(
    "stats_poisson_dispersion",
    oracle="""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc
      FROM hours
    )
    SELECT n AS n_hours, sc AS n_events,
           ROUND(CAST(n * scc - sc * sc AS DOUBLE)
                 / CAST((n - 1) * sc AS DOUBLE), 6) AS dispersion_index,
           ROUND(CAST(n * scc - sc * sc AS DOUBLE)
                 / CAST(sc AS DOUBLE), 6) AS chi2_stat
    FROM s
    """,
)
def stats_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion of hourly event arrivals — the variance/mean
    dispersion index D (a Poisson process has D = 1; D >> 1 means bursty,
    clumped traffic; D < 1 means suspiciously regular, e.g. a synthetic
    generator). D = s²/x̄ = (n·Σc² − (Σc)²)/((n−1)·Σc) over per-hour
    counts, and the associated chi-square statistic (n−1)·D — all from
    three BIGINTs (n, Σc, Σc²), so both engines compute the identical
    rational before one final rounded division. One shuffle to the hour
    domain (bounded: hours in the data window), then a scalar aggregate."""
    e = load_table(spark, sf_dir, "events")
    hours = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    s = hours.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    n, sc, scc = F.col("n"), F.col("sc"), F.col("scc")
    num = (n * scc - sc * sc).cast("double")
    return s.select(
        n.alias("n_hours"),
        sc.alias("n_events"),
        F.round(num / ((n - F.lit(1)) * sc).cast("double"), 6).alias(
            "dispersion_index"
        ),
        F.round(num / sc.cast("double"), 6).alias("chi2_stat"),
    )


@query(
    "stats_cramers_v_matrix",
    oracle="""
    WITH pairs AS (
      SELECT 'priority_x_status' AS pair, o_orderpriority AS a,
             o_orderstatus AS b FROM orders
      UNION ALL
      SELECT 'returnflag_x_linestatus', l_returnflag, l_linestatus
      FROM lineitem
    ), cells AS (
      SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS o
      FROM pairs GROUP BY 1, 2, 3
    ), margins AS (
      SELECT pair, a, b, o,
             CAST(SUM(o) OVER (PARTITION BY pair, a) AS BIGINT) AS ra,
             CAST(SUM(o) OVER (PARTITION BY pair, b) AS BIGINT) AS cb,
             CAST(SUM(o) OVER (PARTITION BY pair) AS BIGINT) AS n
      FROM cells
    ), chi AS (
      SELECT pair, MAX(n) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c,
             SUM(CAST(n AS DOUBLE) * POWER(o - CAST(ra * cb AS DOUBLE) / n, 2)
                 / (CAST(ra AS DOUBLE) * cb)) AS chi2
      FROM margins GROUP BY pair
    )
    SELECT pair, CAST(n AS BIGINT) AS n, r AS n_rows_levels,
           c AS n_col_levels,
           ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n * (least(r, c) - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def stats_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect-size matrix over two categorical pairs — the
    association-strength companion to stats_chi2_type_hour's p-value-free
    chi-square: V = sqrt(χ²/(n·(min(r,c)−1))) normalizes χ² into [0,1] so
    dependence is comparable ACROSS tables (priority×status on orders vs
    returnflag×linestatus on lineitem). Contingency cells and margins are
    exact BIGINTs from one groupBy per pair; χ² terms are the only
    doubles, each a deterministic function of five integers (o, ra, cb,
    n) summed over a bounded grid (≤ 5×3 cells per pair — accumulation
    order cannot produce ULP drift at this magnitude spread), rounded at
    6. Scales as a single shuffle per pair to a cells table the size of
    the category product, never the data."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = o.select(
        F.lit("priority_x_status").alias("pair"),
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).unionAll(
        li.select(
            F.lit("returnflag_x_linestatus").alias("pair"),
            F.col("l_returnflag").alias("a"),
            F.col("l_linestatus").alias("b"),
        )
    )
    cells = pairs.groupBy("pair", "a", "b").agg(
        F.count("*").cast("bigint").alias("o")
    )
    margins = cells.select(
        "pair",
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("pair", "a")).cast("bigint").alias("ra"),
        F.sum("o").over(Window.partitionBy("pair", "b")).cast("bigint").alias("cb"),
        F.sum("o").over(Window.partitionBy("pair")).cast("bigint").alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    chi = margins.groupBy("pair").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count_distinct("a").cast("bigint").alias("n_rows_levels"),
        F.count_distinct("b").cast("bigint").alias("n_col_levels"),
        F.sum(
            F.col("n").cast("double")
            * F.pow(F.col("o") - e, F.lit(2))
            / (F.col("ra").cast("double") * F.col("cb"))
        ).alias("chi2_raw"),
    )
    r, c = F.col("n_rows_levels"), F.col("n_col_levels")
    return chi.select(
        "pair",
        "n",
        "n_rows_levels",
        "n_col_levels",
        F.round("chi2_raw", 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2_raw") / (F.col("n") * (F.least(r, c) - 1))), 6
        ).alias("cramers_v"),
    )


@query(
    "agg_harmonic_geo_means",
    oracle=f"""
    WITH dom AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * CAST(ROUND(LN(q) * {_Q}, 0) AS BIGINT)) AS BIGINT)
               AS sln,
             CAST(SUM(c * CAST(ROUND(1.0 * {_Q} / q, 0) AS BIGINT)) AS BIGINT)
               AS srec
      FROM dom
    )
    SELECT n AS n_rows,
           ROUND(EXP(CAST(sln AS DOUBLE) / n / {_Q}), 6) AS geo_mean_qty,
           ROUND(CAST(n AS DOUBLE) * {_Q} / srec, 6) AS harmonic_mean_qty
    FROM s
    """,
)
def agg_harmonic_geo_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric and harmonic means of l_quantity — the two Pythagorean
    means the catalog's arithmetic aggregates don't cover (geo mean is
    THE mean for ratios/growth rates, harmonic for rates). Float sums of
    ln(q) / 1/q are accumulation-order-dependent, so neither engine's
    native SUM is trusted: the quantity domain is value-bounded (TPC-H
    quantities are small integers), so ln(q) and 1/q are quantized to
    1e9-fixed-point BIGINTs ON THE DISTINCT-VALUE DOMAIN and the corpus
    sums are exact integer Σc·term — the same value-domain trick as
    agg_exact_quartiles_price. One groupBy to the ≤50-row domain, one
    scalar aggregate; both engines divide identical integers."""
    li = load_table(spark, sf_dir, "lineitem")
    dom = li.groupBy(F.col("l_quantity").cast("bigint").alias("q")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    ln_q = F.round(F.log(F.col("q").cast("double")) * _Q, 0).cast("bigint")
    rec_q = F.round(F.lit(1.0) * _Q / F.col("q"), 0).cast("bigint")
    s = dom.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * ln_q).cast("bigint").alias("sln"),
        F.sum(F.col("c") * rec_q).cast("bigint").alias("srec"),
    )
    return s.select(
        F.col("n").alias("n_rows"),
        F.round(F.exp(F.col("sln").cast("double") / F.col("n") / _Q), 6).alias(
            "geo_mean_qty"
        ),
        F.round(F.col("n").cast("double") * _Q / F.col("srec"), 6).alias(
            "harmonic_mean_qty"
        ),
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), cum AS (
      SELECT h, c,
             CAST(SUM(c) OVER (ORDER BY h) AS BIGINT) AS run,
             CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS i,
             CAST(SUM(c) OVER () AS BIGINT) AS s,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM hours
    ), dev AS (
      -- n-scaled CUSUM stays integer: n*run_i - i*S
      SELECT h, ABS(n * run - i * s) AS adev, n * run - i * s AS sdev
      FROM cum
    )
    SELECT h AS changepoint_hour, CAST(sdev AS BIGINT) AS scaled_deviation,
           CAST(adev AS BIGINT) AS abs_scaled_deviation
    FROM dev ORDER BY adev DESC, h ASC LIMIT 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline single-changepoint detection over hourly event volume —
    the argmax-|CUSUM| estimator (the offline twin of the online
    events_cusum_hourly monitor): the most likely level-shift point is
    the hour where the cumulative deviation from the global mean is
    largest in absolute value. The deviation is kept INTEGER by scaling
    with n (n·run_i − i·S instead of run_i − i·S/n), so the argmax
    compares exact BIGINTs and ties break on the earlier hour —
    bit-identical across engines. One shuffle to the bounded hour domain,
    one window pass, one top-1."""
    e = load_table(spark, sf_dir, "events")
    hours = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_ord = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = hours.select(
        "h",
        F.sum("c").over(w_ord).cast("bigint").alias("run"),
        F.row_number().over(Window.orderBy("h")).cast("bigint").alias("i"),
        F.sum("c").over(w_all).cast("bigint").alias("s"),
        F.count("*").over(w_all).cast("bigint").alias("n"),
    )
    sdev = (F.col("n") * F.col("run") - F.col("i") * F.col("s")).cast("bigint")
    dev = cum.select(
        F.col("h").alias("changepoint_hour"),
        sdev.alias("scaled_deviation"),
        F.abs(sdev).cast("bigint").alias("abs_scaled_deviation"),
    )
    return dev.orderBy(
        F.desc("abs_scaled_deviation"), F.asc("changepoint_hour")
    ).limit(1)


@query(
    "stats_logrank_priority",
    oracle=f"""
    WITH t0 AS (
      SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS t,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ), per_t AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS dt, CAST(SUM(g) AS BIGINT) AS d1t
      FROM t0 GROUP BY t
    ), cum AS (
      SELECT t, dt, d1t,
             CAST(SUM(dt) OVER (ORDER BY t DESC) AS BIGINT) AS nt,
             CAST(SUM(d1t) OVER (ORDER BY t DESC) AS BIGINT) AS n1t
      FROM per_t
    ), terms AS (
      SELECT d1t,
             CAST(ROUND(CAST(dt AS DOUBLE) * n1t * {_Q} / nt, 0) AS BIGINT)
               AS e_q,
             CASE WHEN nt > 1 THEN CAST(ROUND(
               CAST(dt AS DOUBLE) * n1t / nt * (nt - n1t) / nt
               * (nt - dt) / (nt - 1) * {_Q}, 0) AS BIGINT)
             ELSE 0 END AS v_q
      FROM cum
    )
    SELECT CAST(SUM(d1t) AS BIGINT) AS observed_g1,
           ROUND(CAST(SUM(e_q) AS DOUBLE) / {_Q}, 6) AS expected_g1,
           ROUND(CAST(SUM(v_q) AS DOUBLE) / {_Q}, 6) AS variance_g1,
           ROUND((SUM(d1t) - CAST(SUM(e_q) AS DOUBLE) / {_Q})
                 / SQRT(CAST(SUM(v_q) AS DOUBLE) / {_Q}), 6) AS logrank_z
    FROM terms
    """,
)
def stats_logrank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) two-sample survival test on time-to-ship:
    do URGENT/HIGH-priority orders ship on a different timetable than the
    rest? "Survival time" is days from order to line shipment (complete
    data, no censoring — the log-rank statistic is still exactly defined:
    at each distinct day t, observed group-1 events d1t vs hypergeometric
    expectation dt·n1t/nt over the at-risk sets). At-risk counts come
    from one DESCENDING cumulative window over the BOUNDED distinct-day
    domain (the value-domain trick again — the windows never see row
    space), and each E/V term is quantized to 1e9 fixed-point via the
    IDENTICAL IEEE expression tree in both engines before exact integer
    summation; z = (O−E)/√V rounded at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    t0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.datediff("l_shipdate", "o_orderdate").alias("t"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0).alias("g"),
        )
    )
    per_t = t0.groupBy("t").agg(
        F.count("*").cast("bigint").alias("dt"),
        F.sum("g").cast("bigint").alias("d1t"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_t.select(
        "dt",
        "d1t",
        F.sum("dt").over(w_desc).cast("bigint").alias("nt"),
        F.sum("d1t").over(w_desc).cast("bigint").alias("n1t"),
    )
    dt, nt, n1t = (
        F.col("dt").cast("double"), F.col("nt"), F.col("n1t")
    )
    e_q = F.round(dt * n1t * _Q / nt, 0).cast("bigint")
    v_q = F.when(
        F.col("nt") > 1,
        F.round(
            dt * n1t / nt * (F.col("nt") - n1t) / nt
            * (F.col("nt") - F.col("dt")) / (F.col("nt") - 1) * _Q,
            0,
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    terms = cum.select(F.col("d1t"), e_q.alias("e_q"), v_q.alias("v_q"))
    s = terms.agg(
        F.sum("d1t").cast("bigint").alias("o1"),
        F.sum("e_q").cast("bigint").alias("se"),
        F.sum("v_q").cast("bigint").alias("sv"),
    )
    e1 = F.col("se").cast("double") / _Q
    v1 = F.col("sv").cast("double") / _Q
    return s.select(
        F.col("o1").alias("observed_g1"),
        F.round(e1, 6).alias("expected_g1"),
        F.round(v1, 6).alias("variance_g1"),
        F.round((F.col("o1") - e1) / F.sqrt(v1), 6).alias("logrank_z"),
    )


@query(
    "events_retention_curve_fit",
    oracle=f"""
    WITH acts AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events GROUP BY 1, 2
    ), firsts AS (
      SELECT user_id, MIN(d) AS f FROM acts GROUP BY 1
    ), offs AS (
      SELECT CAST(datediff('day', fi.f, a.d) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS c
      FROM acts a JOIN firsts fi ON fi.user_id = a.user_id
      WHERE a.d > fi.f
      GROUP BY 1
    ), pts AS (
      SELECT k, CAST(ROUND(LN(c) * {_Q}, 0) AS BIGINT) AS y
      FROM offs
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS sk,
             CAST(SUM(k * k) AS BIGINT) AS skk,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(k * y) AS BIGINT) AS sky
      FROM pts
    )
    SELECT n AS n_offsets,
           ROUND(CAST(n * sky - sk * sy AS DOUBLE)
                 / CAST(n * skk - sk * sk AS DOUBLE) / {_Q}, 6)
             AS decay_rate_per_day,
           ROUND((CAST(sy AS DOUBLE) / n - CAST(n * sky - sk * sy AS DOUBLE)
                  / CAST(n * skk - sk * sk AS DOUBLE) / n * sk) / {_Q}, 6)
             AS ln_intercept,
           ROUND(-LN(2) * CAST(n * skk - sk * sk AS DOUBLE)
                 / CAST(n * sky - sk * sy AS DOUBLE) * {_Q} / {_Q} / {_Q}
                 * {_Q}, 6) AS half_life_days
    FROM s
    """,
)
def events_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention decay fit — the parametric summary on top of
    events_cohort_retention's raw triangle: active-user counts per
    days-since-first-seen offset k, log-linear OLS ln(c_k) = a + b·k,
    reported as decay rate b, intercept a, and half-life −ln2/b (the
    single number a growth team quotes). The offset domain is bounded by
    the data window (≤ days in the corpus), counts are exact BIGINTs, and
    ln(c_k) is quantized to 1e9 fixed-point BEFORE the closed-form OLS —
    all sums integer-exact, two final rounded divisions. User-keyed
    shuffle to first-seen, then the value-domain regression."""
    e = load_table(spark, sf_dir, "events")
    acts = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("d").alias("f"))
    offs = (
        acts.join(firsts, "user_id")
        .filter(F.col("d") > F.col("f"))
        .groupBy(F.datediff("d", "f").cast("bigint").alias("k"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("c"))
    )
    pts = offs.select(
        "k", F.round(F.log("c") * _Q, 0).cast("bigint").alias("y")
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("k") * F.col("y")).cast("bigint").alias("sky"),
    )
    n, sk, skk, sy, sky = (F.col(c) for c in ("n", "sk", "skk", "sy", "sky"))
    b_num = (n * sky - sk * sy).cast("double")
    b_den = (n * skk - sk * sk).cast("double")
    b = b_num / b_den / _Q
    return s.select(
        n.alias("n_offsets"),
        F.round(b, 6).alias("decay_rate_per_day"),
        F.round((sy.cast("double") / n - b_num / b_den / n * sk) / _Q, 6)
        .alias("ln_intercept"),
        F.round(
            -F.log(F.lit(2.0)) * b_den / b_num * _Q / _Q / _Q * _Q, 6
        ).alias("half_life_days"),
    )


@query(
    "agg_theil_index",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_mktsegment AS seg,
             CAST(ROUND(SUM(o.o_totalprice), 0) AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_mktsegment
      HAVING CAST(ROUND(SUM(o.o_totalprice), 0) AS BIGINT) >= 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(x * LN(x) * 1000, 0) AS BIGINT)) AS BIGINT)
               AS sxlnx_k
      FROM spend
    ), g AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(x) AS BIGINT) AS sg
      FROM spend GROUP BY seg
    ), btw AS (
      SELECT CAST(SUM(CAST(ROUND(
               CAST(sg AS DOUBLE) / s.sx
               * LN(CAST(sg AS DOUBLE) * s.n / s.sx / ng) * {_Q}, 0)
             AS BIGINT)) AS BIGINT) AS tb_q
      FROM g, s
    )
    SELECT s.n AS n_customers,
           ROUND(CAST(sxlnx_k AS DOUBLE) / 1000 / s.sx
                 - LN(CAST(s.sx AS DOUBLE) / s.n), 6) AS theil_total,
           ROUND(CAST(tb_q AS DOUBLE) / {_Q}, 6) AS theil_between,
           ROUND(CAST(sxlnx_k AS DOUBLE) / 1000 / s.sx
                 - LN(CAST(s.sx AS DOUBLE) / s.n)
                 - CAST(tb_q AS DOUBLE) / {_Q}, 6) AS theil_within
    FROM s, btw
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer spend, DECOMPOSED into
    between-segment and within-segment components — the property that
    makes Theil the analyst's Gini (agg_gini_customer_spend measures
    level; Theil answers "is the concentration BETWEEN market segments
    or inside them"). Spend is rounded to whole dollars (BIGINT x ≥ 1,
    identical in both engines), each x·ln(x) row term is quantized to
    millidollars before the exact integer sum (T = Σx·lnx/S − ln μ),
    and the 5 between-group terms quantize at 1e9 — the stats2
    discipline end to end. One customer-keyed shuffle, then
    segment-bounded algebra."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 0).cast("bigint").alias("x"))
        .filter(F.col("x") >= 1)
        .select(F.col("c_mktsegment").alias("seg"), "x")
    )
    s = spend.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(
            F.round(F.col("x") * F.log(F.col("x").cast("double")) * 1000, 0)
            .cast("bigint")
        ).cast("bigint").alias("sxlnx_k"),
    )
    g = spend.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
    )
    btw = (
        g.crossJoin(F.broadcast(s))
        .select(
            F.round(
                F.col("sg").cast("double") / F.col("sx")
                * F.log(
                    F.col("sg").cast("double") * F.col("n")
                    / F.col("sx") / F.col("ng")
                )
                * _Q,
                0,
            ).cast("bigint").alias("tq")
        )
        .agg(F.sum("tq").cast("bigint").alias("tb_q"))
    )
    t_total = (
        F.col("sxlnx_k").cast("double") / 1000 / F.col("sx")
        - F.log(F.col("sx").cast("double") / F.col("n"))
    )
    tb = F.col("tb_q").cast("double") / _Q
    return s.crossJoin(btw).select(
        F.col("n").alias("n_customers"),
        F.round(t_total, 6).alias("theil_total"),
        F.round(tb, 6).alias("theil_between"),
        F.round(t_total - tb, 6).alias("theil_within"),
    )


@query(
    "agg_hhi_concentration",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS r
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT seg, CAST(SUM(r) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n_nations
      FROM rev GROUP BY 1
    )
    SELECT rev.seg, tot.n_nations,
           CAST(SUM(CAST(ROUND(
             CAST(rev.r AS DOUBLE) * rev.r * {_Q} / tot.t / tot.t, 0)
           AS BIGINT)) AS BIGINT) AS hhi_q,
           ROUND(CAST(SUM(CAST(ROUND(
             CAST(rev.r AS DOUBLE) * rev.r * {_Q} / tot.t / tot.t, 0)
           AS BIGINT)) AS DOUBLE) / {_Q} * 10000, 6) AS hhi_points
    FROM rev JOIN tot ON tot.seg = rev.seg
    GROUP BY rev.seg, tot.n_nations
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of revenue across nations,
    per market segment — the antitrust-style "how concentrated is this
    market" index (HHI = Σ share², scaled ×10,000; <1,500 competitive,
    >2,500 concentrated) that rounds out the inequality shelf next to
    Gini and Theil. Revenue shares are exact cent BIGINTs; each nation's
    share² term is quantized to 1e9 fixed point via the identical IEEE
    expression (r²·Q/t²) before the exact integer sum — bounded domain
    (25 nations × 5 segments). Two keyed shuffles (order→customer
    broadcast-eligible dim joins), then segment-bounded algebra."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("r")
        )
    )
    # segment totals via a window over the (≤ segments×nations)-row rev
    # table — one pass, no recompute of the upstream join tree (a
    # groupBy+self-join here would scan orders twice at 100 TB)
    w_seg = Window.partitionBy("seg")
    rev = rev.select(
        "seg",
        "r",
        F.sum("r").over(w_seg).cast("bigint").alias("t"),
        F.count("*").over(w_seg).cast("bigint").alias("n_nations"),
    )
    term = F.round(
        F.col("r").cast("double") * F.col("r") * _Q / F.col("t") / F.col("t"),
        0,
    ).cast("bigint")
    joined = rev.select("seg", "n_nations", term.alias("tq"))
    return (
        joined.groupBy("seg", "n_nations")
        .agg(F.sum("tq").cast("bigint").alias("hhi_q"))
        .select(
            "seg",
            "n_nations",
            "hhi_q",
            F.round(F.col("hhi_q").cast("double") / _Q * 10000, 6).alias(
                "hhi_points"
            ),
        )
    )


@query(
    "agg_weighted_median_price",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT v, w,
             CAST(COALESCE(SUM(w) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS below,
             CAST(SUM(w) OVER () AS BIGINT) AS tw
      FROM vals
    )
    SELECT CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(SUM(CASE WHEN below < (tw + 1) // 2
                          AND (tw + 1) // 2 <= below + w
                     THEN v ELSE 0 END) AS BIGINT) AS wmedian_cents
    FROM cum
    """,
)
def agg_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted median of l_extendedprice — "the price of the
    median unit sold", which differs from the row-median whenever cheap
    items move in bulk: the order statistic is selected by cumulative
    WEIGHT rank ⌈W/2⌉ over the distinct-cent value domain (the
    agg_exact_quartiles_price machinery with per-value weights Σquantity
    instead of counts). Weights are exact BIGINTs, selection is a
    CASE-gated SUM with exactly one qualifying value; the ordered window
    runs over distinct cents, never rows."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    w_ord = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v",
        "w",
        F.coalesce(F.sum("w").over(w_ord), F.lit(0)).cast("bigint").alias("below"),
        F.sum("w").over(Window.partitionBy()).cast("bigint").alias("tw"),
    )
    rank = F.floor((F.col("tw") + 1) / 2)
    hit = (F.col("below") < rank) & (rank <= F.col("below") + F.col("w"))
    return cum.agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        F.sum(F.when(hit, F.col("v")).otherwise(0)).cast("bigint").alias(
            "wmedian_cents"
        ),
    )


@query(
    "agg_entropy_by_dimension",
    oracle=f"""
    WITH dims AS (
      SELECT 'orderpriority' AS dim, o_orderpriority AS v FROM orders
      UNION ALL SELECT 'orderstatus', o_orderstatus FROM orders
      UNION ALL SELECT 'mktsegment', c_mktsegment FROM customer
      UNION ALL SELECT 'returnflag', l_returnflag FROM lineitem
    ), cells AS (
      SELECT dim, v, CAST(COUNT(*) AS BIGINT) AS c FROM dims GROUP BY 1, 2
    ), tot AS (
      SELECT dim, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM cells GROUP BY 1
    )
    SELECT cells.dim, tot.k AS n_levels,
           ROUND(CAST(SUM(CAST(ROUND(
             -CAST(cells.c AS DOUBLE) / tot.n
             * LN(CAST(cells.c AS DOUBLE) / tot.n) * {_Q}, 0) AS BIGINT))
             AS DOUBLE) / {_Q}, 6) AS entropy_nats,
           ROUND(CAST(SUM(CAST(ROUND(
             -CAST(cells.c AS DOUBLE) / tot.n
             * LN(CAST(cells.c AS DOUBLE) / tot.n) * {_Q}, 0) AS BIGINT))
             AS DOUBLE) / {_Q} / LN(tot.k), 6) AS efficiency
    FROM cells JOIN tot ON tot.dim = cells.dim
    GROUP BY cells.dim, tot.k, tot.n
    """,
)
def agg_entropy_by_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and normalized efficiency H/ln k) of four
    categorical dimensions across three tables — the data-profiling
    "is this column informative or near-constant" signal next to
    text_source_entropy's corpus twin: efficiency ≈ 1 means uniform
    usage, ≈ 0 means one dominant level (a candidate constant/partition
    column). Each −p·ln p term is quantized to 1e9 fixed point via the
    identical expression on the level-bounded cells table, then
    integer-summed; one groupBy per dimension to category-sized cells."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        o.select(F.lit("orderpriority").alias("dim"),
                 F.col("o_orderpriority").alias("v"))
        .unionAll(o.select(F.lit("orderstatus"), F.col("o_orderstatus")))
        .unionAll(c.select(F.lit("mktsegment"), F.col("c_mktsegment")))
        .unionAll(li.select(F.lit("returnflag"), F.col("l_returnflag")))
    )
    cells = dims.groupBy("dim", "v").agg(F.count("*").cast("bigint").alias("c"))
    # per-dimension totals via a window over the level-bounded cells
    # table — a groupBy+join here would recompute the three-table union
    # scan twice (same single-pass fix as agg_hhi_concentration)
    w_dim = Window.partitionBy("dim")
    cells = cells.select(
        "dim",
        "c",
        F.sum("c").over(w_dim).cast("bigint").alias("n"),
        F.count("*").over(w_dim).cast("bigint").alias("k"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p) * _Q, 0).cast("bigint")
    joined = cells.select("dim", "k", "n", term.alias("tq"))
    ent = F.col("hq").cast("double") / _Q
    return (
        joined.groupBy("dim", "k", "n")
        .agg(F.sum("tq").cast("bigint").alias("hq"))
        .select(
            "dim",
            F.col("k").alias("n_levels"),
            F.round(ent, 6).alias("entropy_nats"),
            F.round(ent / F.log(F.col("k").cast("double")), 6).alias(
                "efficiency"
            ),
        )
    )


@query(
    "stats_kaplan_meier_shipping",
    oracle=f"""
    WITH spans AS (
      SELECT datediff('day', o.o_orderdate, l.l_shipdate) AS t
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ), per_t AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS d FROM spans
      WHERE t <= 60 GROUP BY t
    ), censored AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM spans WHERE t > 60
    ), cum AS (
      SELECT t, d,
             CAST(SUM(d) OVER (ORDER BY t DESC) AS BIGINT)
               + (SELECT c FROM censored) AS n_at_risk
      FROM per_t
    ), terms AS (
      SELECT t, d, n_at_risk,
             CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n_at_risk) * {_Q}, 0)
               AS BIGINT) AS lq
      FROM cum
    )
    SELECT t AS day, d AS n_shipped, n_at_risk,
           ROUND(EXP(CAST(SUM(lq) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / {_Q}), 6) AS survival
    FROM terms
    """,
)
def stats_kaplan_meier_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-ship WITH real censoring —
    the estimator stats_logrank_priority compares groups with, here as
    the full curve: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i), where lines still
    unshipped at the 60-day administrative cutoff are CENSORED (they
    contribute to every at-risk set but never to the events — the
    defining subtlety naive "percent shipped by day t" gets wrong).
    At-risk counts come from the DESC cumulative window over the bounded
    day domain plus the censored tail; each ln(1−d/n) factor is
    1e9-quantized via the identical expression, and the running product
    is exp of the exact integer prefix sum — so every point on the curve
    value-oracles. One keyed join shuffle, then day-domain algebra."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    spans = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(F.datediff("l_shipdate", "o_orderdate").alias("t"))
        .localCheckpoint(eager=False)
    )
    per_t = (
        spans.filter(F.col("t") <= 60)
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    censored = spans.filter(F.col("t") > 60).agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_t.crossJoin(F.broadcast(censored)).select(
        "t",
        "d",
        (F.sum("d").over(w_desc) + F.col("c")).cast("bigint").alias("n_at_risk"),
    )
    lq = F.round(
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")) * _Q,
        0,
    ).cast("bigint")
    terms = cum.select("t", "d", "n_at_risk", lq.alias("lq"))
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        F.col("t").alias("day"),
        F.col("d").alias("n_shipped"),
        "n_at_risk",
        F.round(
            F.exp(F.sum("lq").over(w_asc).cast("double") / _Q), 6
        ).alias("survival"),
    )


@query(
    "agg_trimmed_mean_price",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT v, c,
             CAST(COALESCE(SUM(c) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS below,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM vals
    ), bounds AS (
      SELECT v, c, below, n,
             n // 20 AS lo_cut,             -- 5% trim each side
             n - n // 20 AS hi_cut,
             GREATEST(below, n // 20) AS kept_lo,
             LEAST(below + c, n - n // 20) AS kept_hi
      FROM cum
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN kept_hi > kept_lo
                         THEN v * (kept_hi - kept_lo) ELSE 0 END) AS BIGINT)
             AS kept_cents_sum,
           CAST(SUM(CASE WHEN kept_hi > kept_lo
                         THEN kept_hi - kept_lo ELSE 0 END) AS BIGINT)
             AS kept_rows,
           ROUND(CAST(SUM(CASE WHEN kept_hi > kept_lo
                               THEN v * (kept_hi - kept_lo) ELSE 0 END)
                      AS DOUBLE)
                 / SUM(CASE WHEN kept_hi > kept_lo
                            THEN kept_hi - kept_lo ELSE 0 END) / 100, 6)
             AS trimmed_mean
    FROM bounds
    """,
)
def agg_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-each-side TRIMMED mean of l_extendedprice — the robust-location
    sibling of agg_winsorized_mean (winsorizing CLAMPS the tails; trimming
    DROPS them). Exact by rank arithmetic on the distinct-cent value
    domain: each value keeps max(0, min(below+c, n−n/20) − max(below,
    n/20)) of its multiplicity — no row sort, no percentile approximation,
    the same order-statistic discipline as the quartile/weighted-median
    rows. All sums are exact BIGINTs; one rounded division at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w_ord = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v",
        "c",
        F.coalesce(F.sum("c").over(w_ord), F.lit(0)).cast("bigint").alias("below"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    lo = F.floor(F.col("n") / 20)
    hi = F.col("n") - lo
    kept_lo = F.greatest(F.col("below"), lo)
    kept_hi = F.least(F.col("below") + F.col("c"), hi)
    kept = F.when(kept_hi > kept_lo, kept_hi - kept_lo).otherwise(0)
    b = cum.select(
        "n",
        (F.col("v") * kept).cast("bigint").alias("vs"),
        kept.cast("bigint").alias("k"),
    )
    return b.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.sum("vs").cast("bigint").alias("kept_cents_sum"),
        F.sum("k").cast("bigint").alias("kept_rows"),
        F.round(
            F.sum("vs").cast("double") / F.sum("k") / 100, 6
        ).alias("trimmed_mean"),
    )


@query(
    "stats_ab_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS grp,
             CAST(SUM(CASE WHEN ts <  TIMESTAMP '2024-01-15'
                           THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                           THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents
      FROM events GROUP BY user_id
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pre_cents) AS BIGINT) AS sx,
             CAST(SUM(post_cents) AS BIGINT) AS sy,
             CAST(SUM(pre_cents * pre_cents) AS BIGINT) AS sxx,
             CAST(SUM(pre_cents * post_cents) AS BIGINT) AS sxy
      FROM per_user
    ), theta AS (
      SELECT n, sx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS th
      FROM s
    ), grp_sums AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(post_cents) AS BIGINT) AS sum_post,
             CAST(SUM(pre_cents) AS BIGINT) AS sum_pre
      FROM per_user GROUP BY grp
    ), adj AS (
      SELECT g.grp, g.ng, g.sum_post,
             CAST(g.sum_post AS DOUBLE)
               - t.th * (CAST(g.sum_pre AS DOUBLE)
                         - CAST(g.ng AS DOUBLE)
                           * (CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)))
               AS sum_adj
      FROM grp_sums g, theta t
    )
    SELECT ROUND((SELECT th FROM theta), 6) AS theta,
           ROUND(CAST(b.sum_post AS DOUBLE) / b.ng
                 - CAST(a.sum_post AS DOUBLE) / a.ng, 6) AS naive_diff_cents,
           ROUND(b.sum_adj / b.ng - a.sum_adj / a.ng, 6)
             AS cuped_diff_cents
    FROM adj a, adj b
    WHERE a.grp = 0 AND b.grp = 1
    """,
)
def stats_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED covariate adjustment (Deng et al., WSDM'13) for a synthetic
    A/B split — the variance-reduction step every modern experimentation
    platform applies before reading a treatment effect: per-user POST
    metric adjusted by the PRE-period covariate, Ŷ = Y − θ(X − X̄) with
    θ = cov(X,Y)/var(X). Users hash into arms by parity; pre/post periods
    split at a fixed date; all moments are exact BIGINT sums of cent
    values and θ is one double from five integers. The group adjusted
    sum is computed ALGEBRAICALLY from those exact sums —
    Σ(Y−θ(X−X̄)) = ΣY − θ(ΣX − n·X̄) — so only a constant COUNT of
    double ops remain and no per-user double is ever accumulated
    (accumulation order can't diverge between Spark partitions and
    DuckDB scans); both engines run the identical expression tree,
    rounded at 6. One user-keyed shuffle, then constant-size algebra;
    at 100 TB the per-user collapse IS the pipeline (moments ride
    map-side combine)."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0))
        .cast("bigint").alias("pre_cents"),
        F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0))
        .cast("bigint").alias("post_cents"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        "pre_cents",
        "post_cents",
    ).localCheckpoint(eager=False)
    s = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pre_cents").cast("bigint").alias("sx"),
        F.sum("post_cents").cast("bigint").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents")).cast("bigint").alias("sxx"),
        F.sum(F.col("pre_cents") * F.col("post_cents")).cast("bigint").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    theta = s.select(
        "n",
        "sx",
        ((n * sxy - sx * sy).cast("double")
         / (n * sxx - sx * sx).cast("double")).alias("th"),
    )
    grp_sums = per_user.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("post_cents").cast("bigint").alias("sum_post"),
        F.sum("pre_cents").cast("bigint").alias("sum_pre"),
    )
    adj = grp_sums.crossJoin(F.broadcast(theta)).select(
        "grp",
        "ng",
        "sum_post",
        (
            F.col("sum_post").cast("double")
            - F.col("th")
            * (
                F.col("sum_pre").cast("double")
                - F.col("ng").cast("double")
                * (sx.cast("double") / n.cast("double"))
            )
        ).alias("sum_adj"),
    )
    a = adj.filter(F.col("grp") == 0).select(
        F.col("ng").alias("na"), F.col("sum_post").alias("pa"),
        F.col("sum_adj").alias("aa"),
    )
    b = adj.filter(F.col("grp") == 1).select(
        F.col("ng").alias("nb"), F.col("sum_post").alias("pb"),
        F.col("sum_adj").alias("ab"),
    )
    return (
        # explicit broadcast hints: a/b are 1-row filters of a
        # checkpoint-backed plan whose size ESTIMATE is unknown, so at
        # sf0.1 the planner stopped auto-broadcasting and fell back to a
        # physical CartesianProduct (caught by the r11 full-sf0.1 sweep)
        theta.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b))
        .select(
            F.round("th", 6).alias("theta"),
            F.round(
                F.col("pb").cast("double") / F.col("nb")
                - F.col("pa").cast("double") / F.col("na"),
                6,
            ).alias("naive_diff_cents"),
            F.round(
                F.col("ab") / F.col("nb") - F.col("aa") / F.col("na"), 6
            ).alias("cuped_diff_cents"),
        )
    )


@query(
    "stats_ab_srm_check",
    oracle="""
    WITH arms AS (
      SELECT CAST(user_id % 2 AS INT) AS grp,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(n_users) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN grp = 0 THEN n_users END) AS BIGINT) AS n0,
             CAST(MAX(CASE WHEN grp = 1 THEN n_users END) AS BIGINT) AS n1
      FROM arms
    )
    SELECT n0 AS users_control, n1 AS users_treatment,
           ROUND(CAST((2 * n0 - n) * (2 * n0 - n) AS DOUBLE)
                 / CAST(2 * n AS DOUBLE) * 2, 6) AS srm_chi2,
           CAST(CASE WHEN CAST((2 * n0 - n) * (2 * n0 - n) AS DOUBLE)
                          / CAST(2 * n AS DOUBLE) * 2 > 3.841
                     THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM s
    """,
)
def stats_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-Ratio-Mismatch check for the parity A/B split — the FIRST
    gate an experimentation platform runs (a biased assignment invalidates
    every downstream read, CUPED included): χ² of observed arm sizes
    against the designed 50/50, flagged at the 1-df 5% critical value
    3.841. For two arms the statistic collapses to (2n₀−n)²/ (n/2) summed
    over both arms = (2n₀−n)²·2/(2n) — one rational from two BIGINTs.
    One distinct-count shuffle keyed by user."""
    e = load_table(spark, sf_dir, "events")
    arms = e.groupBy((F.col("user_id") % 2).cast("int").alias("grp")).agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )
    s = arms.agg(
        F.sum("n_users").cast("bigint").alias("n"),
        F.max(F.when(F.col("grp") == 0, F.col("n_users"))).cast("bigint").alias("n0"),
        F.max(F.when(F.col("grp") == 1, F.col("n_users"))).cast("bigint").alias("n1"),
    )
    dev = (2 * F.col("n0") - F.col("n"))
    chi2 = dev.cast("double") * dev / (2 * F.col("n")).cast("double") * 2
    return s.select(
        F.col("n0").alias("users_control"),
        F.col("n1").alias("users_treatment"),
        F.round(chi2, 6).alias("srm_chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


@query(
    "stats_diff_in_diff",
    oracle="""
    WITH cells AS (
      SELECT CAST(user_id % 2 AS INT) AS grp,
             CAST(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                       THEN 1 ELSE 0 END AS INT) AS period,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT
      ROUND(CAST(MAX(CASE WHEN grp = 1 AND period = 1 THEN cents END)
                 AS DOUBLE)
            / MAX(CASE WHEN grp = 1 AND period = 1 THEN n_events END)
          - CAST(MAX(CASE WHEN grp = 1 AND period = 0 THEN cents END)
                 AS DOUBLE)
            / MAX(CASE WHEN grp = 1 AND period = 0 THEN n_events END), 6)
        AS treat_delta_cents,
      ROUND(CAST(MAX(CASE WHEN grp = 0 AND period = 1 THEN cents END)
                 AS DOUBLE)
            / MAX(CASE WHEN grp = 0 AND period = 1 THEN n_events END)
          - CAST(MAX(CASE WHEN grp = 0 AND period = 0 THEN cents END)
                 AS DOUBLE)
            / MAX(CASE WHEN grp = 0 AND period = 0 THEN n_events END), 6)
        AS control_delta_cents,
      ROUND((CAST(MAX(CASE WHEN grp = 1 AND period = 1 THEN cents END)
                  AS DOUBLE)
             / MAX(CASE WHEN grp = 1 AND period = 1 THEN n_events END)
           - CAST(MAX(CASE WHEN grp = 1 AND period = 0 THEN cents END)
                  AS DOUBLE)
             / MAX(CASE WHEN grp = 1 AND period = 0 THEN n_events END))
          - (CAST(MAX(CASE WHEN grp = 0 AND period = 1 THEN cents END)
                  AS DOUBLE)
             / MAX(CASE WHEN grp = 0 AND period = 1 THEN n_events END)
           - CAST(MAX(CASE WHEN grp = 0 AND period = 0 THEN cents END)
                  AS DOUBLE)
             / MAX(CASE WHEN grp = 0 AND period = 0 THEN n_events END)), 6)
        AS did_estimate_cents
    FROM cells
    """,
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate over the 2×2 (arm × pre/post)
    grid — the causal-inference workhorse when randomization is imperfect:
    the treatment effect is the treated arm's pre→post delta minus the
    control arm's (which absorbs the common time trend CUPED's covariate
    can't). Four cells of exact BIGINT (Σcents, n) from ONE groupBy; the
    three reported numbers are ratios/differences of those eight
    integers via identical expression trees, rounded at 6."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    cells = e.groupBy(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.when(F.col("ts") >= cutoff, 1).otherwise(0).cast("int").alias("period"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint").alias("cents"),
        F.count("*").cast("bigint").alias("n_events"),
    )

    def cell(g, p, col):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col(col))
        )

    def mean(g, p):
        return cell(g, p, "cents").cast("double") / cell(g, p, "n_events")

    treat_delta = mean(1, 1) - mean(1, 0)
    control_delta = mean(0, 1) - mean(0, 0)
    return cells.agg(
        F.round(treat_delta, 6).alias("treat_delta_cents"),
        F.round(control_delta, 6).alias("control_delta_cents"),
        F.round(treat_delta - control_delta, 6).alias("did_estimate_cents"),
    )


@query(
    "agg_group_exact_median",
    oracle="""
    WITH vals AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, v, c,
             CAST(COALESCE(SUM(c) OVER (
               PARTITION BY flag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS below,
             CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n
      FROM vals
    )
    SELECT flag, CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN below < (n + 1) // 2
                          AND (n + 1) // 2 <= below + c
                     THEN v ELSE 0 END)
                + SUM(CASE WHEN below < (n + 2) // 2
                            AND (n + 2) // 2 <= below + c
                      THEN v ELSE 0 END) AS BIGINT) AS median2_cents
    FROM cum GROUP BY flag
    """,
)
def agg_group_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP exact medians — the order-statistic selection machinery
    of agg_exact_quartiles_price PARTITIONED by l_returnflag, showing the
    technique generalizes from a global scalar to grouped analytics
    without a per-group sort of row space: the cumulative window runs
    over each group's distinct-cent domain, and both middle ranks are
    carried as the exact-integer 2·median. At 100 TB each group's ordered
    pass is value-domain-bounded and groups parallelize independently —
    the grouped-exact-quantile shape percentile_approx users reach for
    when sketch error isn't acceptable."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    w_ord = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.select(
        "flag",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w_ord), F.lit(0)).cast("bigint").alias("below"),
        F.sum("c").over(Window.partitionBy("flag")).cast("bigint").alias("n"),
    )
    n = F.col("n")

    def pick(rank):
        hit = (F.col("below") < rank) & (rank <= F.col("below") + F.col("c"))
        return F.sum(F.when(hit, F.col("v")).otherwise(0)).cast("bigint")

    return cum.groupBy("flag").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        (pick(F.floor((n + 1) / 2)) + pick(F.floor((n + 2) / 2)))
        .cast("bigint").alias("median2_cents"),
    )


@query(
    "stats_partial_correlation",
    oracle="""
    WITH rows_q AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS z
      FROM lineitem
    ), s AS (
      -- moment sums stay HUGEINT (int128): y is cents, so Σy² overflows
      -- a 64-bit int already at sf0.01 — the Spearman decimal(38,0)
      -- discipline on the Spark side matches this exactly
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
             SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz
      FROM rows_q
    ), r AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
             CAST(n * sxz - sx * sz AS DOUBLE)
               / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * szz - sz * sz AS DOUBLE)) AS rxz,
             CAST(n * syz - sy * sz AS DOUBLE)
               / SQRT(CAST(n * syy - sy * sy AS DOUBLE)
                      * CAST(n * szz - sz * sz AS DOUBLE)) AS ryz
      FROM s
    )
    SELECT n AS n_rows,
           ROUND(rxy, 6) AS r_qty_price,
           ROUND(rxz, 6) AS r_qty_discount,
           ROUND(ryz, 6) AS r_price_discount,
           ROUND((rxy - rxz * ryz)
                 / SQRT((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
             AS partial_r_qty_price_given_discount
    FROM r
    """,
)
def stats_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order PARTIAL correlation r(quantity, price | discount) —
    the confounder-controlled association agg_correlation_exact can't
    answer (does quantity still track price once the discount channel is
    partialled out?): r_xy.z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)),
    with all three pairwise correlations computed from ONE pass of ten
    exact BIGINT moments (cents/percent quantization) and the formula
    evaluated by the identical expression tree in both engines. The
    moments ride map-side combine — one scalar exchange at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_q = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("z"),
    )
    dec = "decimal(38,0)"
    s = rows_q.agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            F.sum(expr.cast(dec)).alias(name)
            for name, expr in [
                ("sx", F.col("x")), ("sy", F.col("y")), ("sz", F.col("z")),
                ("sxx", F.col("x") * F.col("x")),
                ("syy", F.col("y") * F.col("y")),
                ("szz", F.col("z") * F.col("z")),
                ("sxy", F.col("x") * F.col("y")),
                ("sxz", F.col("x") * F.col("z")),
                ("syz", F.col("y") * F.col("z")),
            ]
        ],
    )
    n = F.col("n")

    def corr(sa, sb, sab, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double") / F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
            * (n * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
        )

    r = s.select(
        "n",
        corr("sx", "sy", "sxy", "sxx", "syy").alias("rxy"),
        corr("sx", "sz", "sxz", "sxx", "szz").alias("rxz"),
        corr("sy", "sz", "syz", "syy", "szz").alias("ryz"),
    )
    rxy, rxz, ryz = F.col("rxy"), F.col("rxz"), F.col("ryz")
    return r.select(
        F.col("n").alias("n_rows"),
        F.round(rxy, 6).alias("r_qty_price"),
        F.round(rxz, 6).alias("r_qty_discount"),
        F.round(ryz, 6).alias("r_price_discount"),
        F.round(
            (rxy - rxz * ryz)
            / F.sqrt((1 - rxz * rxz) * (1 - ryz * ryz)),
            6,
        ).alias("partial_r_qty_price_given_discount"),
    )


@query(
    "stats_runs_test_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), signs AS (
      SELECT d, CASE WHEN rev > LAG(rev) OVER (ORDER BY d) THEN 1 ELSE 0 END
               AS up,
             LAG(rev) OVER (ORDER BY d) AS prev
      FROM daily
    ), seq AS (
      SELECT d, up,
             CASE WHEN LAG(up) OVER (ORDER BY d) IS NULL
                    OR up <> LAG(up) OVER (ORDER BY d)
                  THEN 1 ELSE 0 END AS new_run
      FROM signs WHERE prev IS NOT NULL
    ), s AS (
      SELECT CAST(SUM(new_run) AS BIGINT) AS runs,
             CAST(SUM(up) AS BIGINT) AS n_up,
             CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down
      FROM seq
    )
    SELECT runs, n_up, n_down,
           ROUND(1.0 + 2.0 * n_up * n_down / (n_up + n_down), 6)
             AS expected_runs,
           ROUND((runs - (1.0 + 2.0 * n_up * n_down / (n_up + n_down)))
                 / SQRT(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n_up - n_down)
                        / ((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1))), 6) AS runs_z
    FROM s
    """,
)
def stats_runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz RUNS TEST on the up/down signs of day-over-day
    revenue — the randomness check behind "is this series trending /
    mean-reverting or i.i.d. noise" that autocorrelation's linear view
    can miss: too FEW runs means momentum, too MANY means oscillation.
    Signs come from one lag over the bounded day domain, runs from one
    more lag; R, n₊, n₋ are exact BIGINTs and E[R]/Var[R]/z are the
    closed forms evaluated by identical expression trees, rounded at 6."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("rev")
    )
    w = Window.orderBy("d")
    signs = daily.select(
        "d",
        F.when(F.col("rev") > F.lag("rev").over(w), 1).otherwise(0).alias("up"),
        F.lag("rev").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    seq = signs.select(
        "up",
        F.when(
            F.lag("up").over(w).isNull()
            | (F.col("up") != F.lag("up").over(w)),
            1,
        ).otherwise(0).alias("new_run"),
    )
    s = seq.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum("up").cast("bigint").alias("n_up"),
        (F.count("*") - F.sum("up")).cast("bigint").alias("n_down"),
    )
    nu, nd, r = F.col("n_up"), F.col("n_down"), F.col("runs")
    n = nu + nd
    e_runs = 1.0 + 2.0 * nu * nd / n
    var = (
        2.0 * nu * nd * (2.0 * nu * nd - nu - nd)
        / (n * n * (n - 1))
    )
    return s.select(
        "runs",
        "n_up",
        "n_down",
        F.round(e_runs, 6).alias("expected_runs"),
        F.round((r - e_runs) / F.sqrt(var), 6).alias("runs_z"),
    )


@query(
    "agg_covariance_matrix",
    oracle="""
    WITH rows_q AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS p,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d,
             CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS t
      FROM lineitem
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd, SUM(t) AS st,
             SUM(q * q) AS sqq, SUM(q * p) AS sqp, SUM(q * d) AS sqd,
             SUM(q * t) AS sqt, SUM(p * p) AS spp, SUM(p * d) AS spd,
             SUM(p * t) AS spt, SUM(d * d) AS sdd, SUM(d * t) AS sdt,
             SUM(t * t) AS stt
      FROM rows_q
    )
    SELECT cell.va AS var_a, cell.vb AS var_b,
           ROUND((CAST(cell.sab AS DOUBLE) - CAST(cell.sa AS DOUBLE)
                  * cell.sb / s.n) / (s.n - 1), 6) AS covariance
    FROM s, LATERAL (
      VALUES ('qty', 'qty', sqq, sq, sq), ('qty', 'price', sqp, sq, sp),
             ('qty', 'disc', sqd, sq, sd), ('qty', 'tax', sqt, sq, st),
             ('price', 'price', spp, sp, sp), ('price', 'disc', spd, sp, sd),
             ('price', 'tax', spt, sp, st), ('disc', 'disc', sdd, sd, sd),
             ('disc', 'tax', sdt, sd, st), ('tax', 'tax', stt, st, st)
    ) AS cell(va, vb, sab, sa, sb)
    """,
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sample COVARIANCE MATRIX over four lineitem measures
    (quantity, whole-dollar price, discount%, tax%) — the multivariate
    profile behind feature selection and the numeric twin of
    stats_cramers_v_matrix's categorical grid: all 10 upper-triangle
    cells from ONE pass of 14 moments (HUGEINT/decimal sums — price is
    kept in whole dollars so Σp² stays in range), each cell the textbook
    (Σab − ΣaΣb/n)/(n−1) evaluated identically in both engines. The
    moments ride map-side combine; the matrix is constant-size."""
    li = load_table(spark, sf_dir, "lineitem")
    rows_q = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice"), 0).cast("bigint").alias("p"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("d"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("t"),
    )
    dec = "decimal(38,0)"
    names = ["q", "p", "d", "t"]
    prods = [
        (a + b, F.col(a) * F.col(b))
        for i, a in enumerate(names)
        for b in names[i:]
    ]
    s = rows_q.agg(
        F.count("*").cast("bigint").alias("n"),
        *[F.sum(F.col(c).cast(dec)).alias("s" + c) for c in names],
        *[F.sum(e.cast(dec)).alias("s" + nm) for nm, e in prods],
    )
    label = {"q": "qty", "p": "price", "d": "disc", "t": "tax"}
    # r14: the 10 cells used to be 10 unionByName'd single-row selects of
    # `s` — TEN full derivations of the 14-moment lineitem aggregate (20
    # parquet scans in the plan). One derivation + an exploded 10-struct
    # array computes the identical cells from the single moment row (§2.4).
    cells = []
    for i, a in enumerate(names):
        for b in names[i:]:
            cov = (
                F.col("s" + a + b).cast("double")
                - F.col("s" + a).cast("double") * F.col("s" + b) / F.col("n")
            ) / (F.col("n") - 1)
            cells.append(
                F.struct(
                    F.lit(label[a]).alias("var_a"),
                    F.lit(label[b]).alias("var_b"),
                    F.round(cov, 6).alias("covariance"),
                )
            )
    return s.select(F.explode(F.array(*cells)).alias("cell")).select("cell.*")


@query(
    "stats_power_law_alpha",
    oracle=f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1
    ), dom AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM counts
      WHERE x >= 3 GROUP BY x
    ), s AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * CAST(ROUND(LN(x / 2.5) * {_Q}, 0) AS BIGINT))
                  AS BIGINT) AS slnq
      FROM dom
    )
    SELECT n AS n_tail_users,
           ROUND(1.0 + CAST(n AS DOUBLE) * {_Q} / slnq, 6) AS alpha_hat,
           ROUND((CAST(n AS DOUBLE) * {_Q} / slnq)
                 / SQRT(CAST(n AS DOUBLE)), 6) AS alpha_se
    FROM s
    """,
)
def stats_power_law_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law tail exponent of per-user activity — the
    Clauset–Shalizi–Newman MLE α̂ = 1 + n/Σln(xᵢ/(xmin−½)) over users
    with ≥ xmin = 3 events (the continuous-approximation estimator with
    the standard −½ offset), plus its asymptotic standard error
    (α̂−1)/√n. THE heavy-tail diagnostic for user activity / degree /
    frequency data: α near 2 means extreme concentration (expect hot
    keys — pre-salt), α > 3 means tame tails. The activity-count domain
    is value-bounded, so ln terms quantize to 1e9 fixed point on the
    distinct-count table and the corpus sum is exact integers — the
    agg_harmonic_geo_means discipline."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("x"))
    dom = (
        counts.filter(F.col("x") >= 3)
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    lnq = F.round(F.log(F.col("x") / 2.5) * _Q, 0).cast("bigint")
    s = dom.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * lnq).cast("bigint").alias("slnq"),
    )
    amin1 = F.col("n").cast("double") * _Q / F.col("slnq")
    return s.select(
        F.col("n").alias("n_tail_users"),
        F.round(1.0 + amin1, 6).alias("alpha_hat"),
        F.round(amin1 / F.sqrt(F.col("n").cast("double")), 6).alias(
            "alpha_se"
        ),
    )


@query(
    "agg_lorenz_curve_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT s, NTILE(10) OVER (ORDER BY s, o_custkey) AS decile
      FROM spend
    ), per_decile AS (
      SELECT decile, CAST(SUM(s) AS BIGINT) AS ds,
             CAST(COUNT(*) AS BIGINT) AS dn
      FROM ranked GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile, dn AS n_customers,
           CAST(SUM(ds) OVER (ORDER BY decile) AS BIGINT) AS cum_cents,
           ROUND(CAST(SUM(ds) OVER (ORDER BY decile) AS DOUBLE)
                 / SUM(ds) OVER (), 6) AS cum_share
    FROM per_decile
    """,
)
def agg_lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LORENZ CURVE behind agg_gini_customer_spend's single number:
    cumulative spend share by customer decile (poorest→richest, NTILE
    with the deterministic custkey tie-break both engines share) — the
    curve an analyst actually plots to see WHERE the concentration
    lives ("bottom 50% hold 9%"). The global NTILE over the customer
    dimension uses the two-phase range-partitioned scan
    (operators/ranking.py) — customers scale WITH the corpus, so a bare
    Window.orderBy would single-partition at 100 TB; the decile-level
    cumulative window afterwards is genuinely bounded (10 rows).
    Cumulative sums are exact cents."""
    from ..operators.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("s")
    )
    ranked = attach_global_order_stats(
        spend, [("s", "asc"), ("o_custkey", "asc")], ntile=(10, "decile")
    ).select("s", "decile")
    per_decile = ranked.groupBy("decile").agg(
        F.sum("s").cast("bigint").alias("ds"),
        F.count("*").cast("bigint").alias("dn"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return per_decile.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("dn").alias("n_customers"),
        F.sum("ds").over(w_cum).cast("bigint").alias("cum_cents"),
        F.round(
            F.sum("ds").over(w_cum).cast("double")
            / F.sum("ds").over(w_all),
            6,
        ).alias("cum_share"),
    )
