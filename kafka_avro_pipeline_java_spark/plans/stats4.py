"""Round-10 statistics shelf: Poisson-bootstrap CIs, sequential testing
(SPRT), and the power-user concentration curve.

Three inference tools a 100 TB experimentation/analytics stack actually
runs: the Poisson bootstrap is THE distributed resampling method (one pass,
no per-resample shuffles — each row draws B independent multiplicities from
hashes, so resample b is an ordinary map-side-combinable aggregate); the
SPRT is the sequential monitor that decides "stop the test early" with
bounded error; the power-user curve is the entity-scaled concentration
readout that must ride the two-phase distributed rank, never a bare global
window.

Oracle discipline (SCALE.md): resample multiplicities come from integer
threshold comparisons on the md5-derived portable hash (no float parity
risk), per-day SPRT terms are 1e9-quantized BIGINTs before the running sum,
and every rank×count product casts one operand to decimal(38,0) first (the
r9 overflow rule — tests/test_overflow_guard.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..operators.ranking import attach_global_order_stats
from ..sources import load_table
from .registry import query

_B = 32  # resamples: bounded by construction, the only fan-out factor

# Truncated-Poisson(1) multiplicity thresholds over the 60-bit hash range:
# P(0)=P(1)=e^-1, P(2)=e^-1/2, P(3)=rest — integer literals so both engines
# bucket identically (never compare floats).
_H_RANGE = 1 << 60
_T0 = int(math.exp(-1.0) * _H_RANGE)           # below: w=0
_T1 = int(2.0 * math.exp(-1.0) * _H_RANGE)     # below: w=1
_T2 = int(2.5 * math.exp(-1.0) * _H_RANGE)     # below: w=2, else w=3


@query(
    "stats_bootstrap_poisson_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY user_id
    ), full_mean AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM per_user
    ), hashed AS (
      SELECT b.b, u.x,
             CAST(('0x' || substr(md5(
               CAST(u.user_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)
             ), 1, 15)) AS BIGINT) AS h
      FROM per_user u, UNNEST(range(0, {_B})) AS b(b)
    ), weighted AS (
      SELECT b, x,
             CASE
               WHEN h < {_T0} THEN 0
               WHEN h < {_T1} THEN 1
               WHEN h < {_T2} THEN 2
               ELSE 3
             END AS w
      FROM hashed
    ), boot AS (
      SELECT b,
             ROUND(CAST(SUM(CAST(w AS BIGINT) * x) AS DOUBLE)
                   / CAST(SUM(w) AS BIGINT), 6) AS m
      FROM weighted GROUP BY b
    ), sorted AS (
      SELECT list_sort(list(m)) AS ms FROM boot
    )
    SELECT ROUND(CAST(f.sx AS DOUBLE) / f.n, 6) AS mean_cents,
           s.ms[2] AS boot_lo,
           s.ms[{_B} - 1] AS boot_hi,
           CAST({_B} AS INT) AS n_resamples
    FROM full_mean f, sorted s
    """,
)
def stats_bootstrap_poisson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP confidence interval for mean revenue per user —
    the distributed bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", the method Google popularized): instead of
    drawing n rows with replacement B times (B full shuffles), every user
    draws B independent Poisson(1)-ish multiplicities from a hash of
    (user_id, b), so all B resample means fall out of ONE explode +
    map-side-combinable aggregate — a single pass at any scale. Here the
    multiplicities are truncated-Poisson(1) {0,1,2,3} from integer
    threshold tests on portable_hash64 (deterministic, engine-identical),
    and the interval is the [2nd, 31st] order statistic of the 32 sorted
    resample means — picked via sort_array on the 32-row collect, no
    window, no single-partition sort anywhere. Resample means are rounded
    BEFORE sorting so both engines order identical doubles."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint").alias("x")
    )
    full = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
    )
    h = portable_hash64(
        F.concat(F.col("user_id").cast("string"), F.lit(":"),
                 F.col("b").cast("string"))
    )
    w = (
        F.when(h < _T0, 0)
        .when(h < _T1, 1)
        .when(h < _T2, 2)
        .otherwise(3)
    )
    boot = (
        per_user.select(
            "user_id", "x", F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b")
        )
        .select("b", "x", w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w").cast("bigint") * F.col("x")).cast("double")
                / F.sum("w").cast("bigint"),
                6,
            ).alias("m")
        )
    )
    sorted_means = boot.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    return (
        full.crossJoin(F.broadcast(sorted_means))
        .select(
            F.round(F.col("sx").cast("double") / F.col("n"), 6).alias("mean_cents"),
            F.element_at("ms", 2).alias("boot_lo"),
            F.element_at("ms", _B - 1).alias("boot_hi"),
            F.lit(_B).cast("int").alias("n_resamples"),
        )
    )


# SPRT constants: H0 p=0.10 vs H1 p=0.15 high-value rate, alpha=0.05,
# beta=0.20. Per-day LLR term = k*ln(p1/p0) + (n-k)*ln(q1/q0), quantized to
# 1e9 fixed-point per literal factor so the running sum is exact integers.
_L_HIT = round(math.log(0.15 / 0.10) * 1e9)      # per high-value event
_L_MISS = round(math.log(0.85 / 0.90) * 1e9)     # per other event
_A_UPPER = round(math.log((1 - 0.20) / 0.05) * 1e9)  # accept H1 above
_B_LOWER = round(math.log(0.20 / (1 - 0.05)) * 1e9)  # accept H0 below


@query(
    "stats_sprt_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 500 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events GROUP BY 1
    ), cum AS (
      SELECT day,
             CAST(SUM(k * {_L_HIT} + (n - k) * ({_L_MISS}))
                  OVER (ORDER BY day) AS BIGINT) AS llr
      FROM daily
    ), crossed AS (
      SELECT MIN(CASE WHEN llr >= {_A_UPPER} OR llr <= {_B_LOWER}
                      THEN day END) AS first_cross_day
      FROM cum
    )
    SELECT c.first_cross_day,
           CASE WHEN x.llr IS NULL THEN 'continue'
                WHEN x.llr >= {_A_UPPER} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           ROUND(CAST((SELECT llr FROM cum ORDER BY day DESC LIMIT 1)
                 AS DOUBLE) / 1e9, 6) AS final_llr
    FROM crossed c
    LEFT JOIN cum x ON x.day = c.first_cross_day
    """,
)
def stats_sprt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SPRT sequential monitor over the daily high-value-event rate
    (H0 p=0.10 vs H1 p=0.15, α=0.05, β=0.20): the cumulative
    log-likelihood ratio in day order, the first day it escapes the
    (ln β/(1−α), ln (1−β)/α) corridor, and the decision — how a live
    experiment stops EARLY with guaranteed error rates instead of waiting
    for a fixed horizon (the sequential member of the experimentation
    shelf next to stats_power_analysis's fixed-n design). Per-day LLR
    terms are exact integers (counts × 1e9-quantized literal log factors)
    so the running sum — a window over the BOUNDED day domain — is
    integer-exact and the boundary comparisons cut identically on both
    engines."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 500, 1).otherwise(0))
        .cast("bigint").alias("k"),
    )
    cum = daily.select(
        "day",
        F.sum(
            F.col("k") * F.lit(_L_HIT) + (F.col("n") - F.col("k")) * F.lit(_L_MISS)
        ).over(Window.orderBy("day")).cast("bigint").alias("llr"),
    )
    crossed = cum.agg(
        F.min(
            F.when(
                (F.col("llr") >= _A_UPPER) | (F.col("llr") <= _B_LOWER),
                F.col("day"),
            )
        ).alias("first_cross_day")
    )
    final = cum.orderBy(F.desc("day")).limit(1).select(
        F.round(F.col("llr").cast("double") / 1e9, 6).alias("final_llr")
    )
    at_cross = cum.withColumnRenamed("day", "first_cross_day")
    return (
        crossed.join(F.broadcast(at_cross), "first_cross_day", "left")
        .crossJoin(F.broadcast(final))
        .select(
            "first_cross_day",
            F.when(F.col("llr").isNull(), "continue")
            .when(F.col("llr") >= _A_UPPER, "accept_h1")
            .otherwise("accept_h0")
            .alias("decision"),
            "final_llr",
        )
    )


@query(
    "events_power_user_curve",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS total
      FROM per_user
    ), ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS r,
             CAST(SUM(c) OVER (ORDER BY c DESC, user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM per_user
    )
    SELECT q.pct AS top_pct,
           CAST(CEIL(q.pct * t.n / 100.0) AS BIGINT) AS n_users,
           ROUND(CAST(x.cum AS DOUBLE) / t.total, 6) AS share_of_events
    FROM tot t,
         UNNEST([1, 5, 10, 50]) AS q(pct)
    JOIN ranked x ON x.r = CAST(CEIL(q.pct * t.n / 100.0) AS BIGINT)
    """,
)
def events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER-USER CONCENTRATION: the share of all events generated by the
    top 1 / 5 / 10 / 50 % most-active users — the "how skewed is our
    load" readout behind rate-limit tiers, cache sizing, and the
    bot-or-whale triage (the events-table sibling of
    agg_customer_ltv_deciles). Users scale WITH the corpus, so the
    descending activity rank + running sum ride the two-phase
    distributed scan (operators/ranking.py::attach_global_order_stats),
    never a bare global window; each checkpoint row is then selected by
    an equi-join on the ceil(q·n) rank. Counts and running sums stay
    integer-exact end to end; the one division is rounded at 6."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("total"),
    )
    ranked = attach_global_order_stats(
        per_user,
        [("c", "desc"), ("user_id", "asc")],
        row_number="r",
        cumsum=("c", "cum"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 50)])).alias("top_pct")
    )
    marks = pcts.crossJoin(F.broadcast(tot)).select(
        "top_pct",
        F.ceil(F.col("top_pct") * F.col("n") / 100.0).cast("bigint").alias("n_users"),
        "total",
    )
    return (
        marks.join(ranked, marks.n_users == ranked.r)
        .select(
            "top_pct",
            "n_users",
            F.round(F.col("cum").cast("double") / F.col("total"), 6)
            .alias("share_of_events"),
        )
    )


@query(
    "stats_tost_equivalence",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                      * CAST(ROUND(value * 100, 0) AS BIGINT)) AS DECIMAL(38,0)) AS sxx
      FROM events GROUP BY event_type
    ), g AS (
      SELECT CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DECIMAL(38,0)) AS gsx,
             CAST(COUNT(*) AS BIGINT) AS gn
      FROM events
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(a.sx AS DOUBLE) / a.n - CAST(b.sx AS DOUBLE) / b.n AS d,
             (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE) / a.n)
               / (a.n - 1) / a.n
             + (CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE) / b.n)
               / (b.n - 1) / b.n AS se2,
             0.02 * (CAST(g.gsx AS DOUBLE) / g.gn) AS delta
      FROM m a JOIN m b ON a.event_type < b.event_type, g
    )
    SELECT type_a, type_b,
           ROUND(d, 6) AS diff_cents,
           ROUND((d + delta) / SQRT(se2), 6) AS t_lower,
           ROUND((delta - d) / SQRT(se2), 6) AS t_upper,
           (ROUND((d + delta) / SQRT(se2), 6) > 1.645
            AND ROUND((delta - d) / SQRT(se2), 6) > 1.645) AS equivalent
    FROM pairs
    """,
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST EQUIVALENCE TESTING (two one-sided tests, Schuirmann 1987) —
    the experimentation-shelf member that answers the question a
    significance test can't: "are these two segments' mean revenues
    PROVABLY similar?" For every event-type pair, test H0: |μa − μb| ≥ δ
    against equivalence within δ = 2% of the grand mean, via two
    one-sided Welch z-statistics (large-sample normal critical value
    1.645): equivalent iff BOTH (d+δ)/se and (δ−d)/se clear it. All
    moments are integer-exact cents sums held in decimal(38,0) (the
    overflow rule — this query joins the dual-SF driver_sim cohort);
    means, variances and the two t-statistics are fixed-order arithmetic
    on those exact moments, rounded to 6 BEFORE the boundary comparison
    so the equivalence booleans can't split on an ulp. One groupBy over
    the fact table + a 10-row pair join."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    m = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(cents.cast("decimal(38,0)")).alias("sx"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sxx"),
    )
    g = e.agg(
        F.sum(cents.cast("decimal(38,0)")).alias("gsx"),
        F.count("*").cast("bigint").alias("gn"),
    )
    a = m.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("an"),
        F.col("sx").alias("asx"),
        F.col("sxx").alias("asxx"),
    )
    b = m.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("bn"),
        F.col("sx").alias("bsx"),
        F.col("sxx").alias("bsxx"),
    )
    pairs = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(g))
        .select(
            "type_a",
            "type_b",
            (
                F.col("asx").cast("double") / F.col("an")
                - F.col("bsx").cast("double") / F.col("bn")
            ).alias("d"),
            (
                (
                    F.col("asxx").cast("double")
                    - F.col("asx").cast("double")
                    * F.col("asx").cast("double")
                    / F.col("an")
                )
                / (F.col("an") - 1)
                / F.col("an")
                + (
                    F.col("bsxx").cast("double")
                    - F.col("bsx").cast("double")
                    * F.col("bsx").cast("double")
                    / F.col("bn")
                )
                / (F.col("bn") - 1)
                / F.col("bn")
            ).alias("se2"),
            (F.lit(0.02) * (F.col("gsx").cast("double") / F.col("gn"))).alias(
                "delta"
            ),
        )
    )
    t_lo = F.round((F.col("d") + F.col("delta")) / F.sqrt("se2"), 6)
    t_hi = F.round((F.col("delta") - F.col("d")) / F.sqrt("se2"), 6)
    return pairs.select(
        "type_a",
        "type_b",
        F.round("d", 6).alias("diff_cents"),
        t_lo.alias("t_lower"),
        t_hi.alias("t_upper"),
        ((t_lo > 1.645) & (t_hi > 1.645)).alias("equivalent"),
    )


@query(
    "stats_median_ci_exact",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS r
      FROM spend
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    ks AS (
      SELECT n,
             CAST(FLOOR((n + 1) / 2.0) AS BIGINT) AS k_med_lo,
             CAST(FLOOR(n / 2.0) + 1 AS BIGINT) AS k_med_hi,
             GREATEST(CAST(FLOOR(n / 2.0 - 1.959964 * SQRT(n / 4.0)) AS BIGINT), 1)
               AS k_lo,
             LEAST(CAST(CEIL(n / 2.0 + 1 + 1.959964 * SQRT(n / 4.0)) AS BIGINT), n)
               AS k_hi
      FROM n
    )
    SELECT ks.n AS n_customers,
           ROUND(((SELECT cents FROM ranked WHERE r = ks.k_med_lo)
                  + (SELECT cents FROM ranked WHERE r = ks.k_med_hi)) / 200.0,
                 6) AS median_spend,
           ROUND((SELECT cents FROM ranked WHERE r = ks.k_lo) / 100.0, 6)
             AS ci_lo,
           ROUND((SELECT cents FROM ranked WHERE r = ks.k_hi) / 100.0, 6)
             AS ci_hi
    FROM ks
    """,
)
def stats_median_ci_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION-FREE MEDIAN CONFIDENCE INTERVAL — the exact
    order-statistic CI (binomial/normal-approximation bounds: ranks
    n/2 ∓ z·√(n/4), the nonparametric interval that needs NO variance
    estimate and holds for any continuous distribution): the customer-
    spend median with its 95% CI read off three global ranks. Ranks
    come from the two-phase distributed scan
    (operators/ranking.py::attach_global_order_stats — repartitionByRange
    + per-partition sort + offset collect), never a single-partition
    window; the three target ranks are then picked by one broadcast-able
    equi-join on the rank column. Rank formulas use only n, so both
    engines derive identical integer ranks; spends are exact cents."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked = attach_global_order_stats(
        spend, [("cents", "asc"), ("o_custkey", "asc")], row_number="r"
    )
    n_df = ranked.agg(F.count("*").cast("bigint").alias("n"))
    ks = n_df.select(
        "n",
        F.floor((F.col("n") + 1) / 2.0).cast("bigint").alias("k_med_lo"),
        (F.floor(F.col("n") / 2.0) + 1).cast("bigint").alias("k_med_hi"),
        F.greatest(
            F.floor(
                F.col("n") / 2.0 - 1.959964 * F.sqrt(F.col("n") / 4.0)
            ).cast("bigint"),
            F.lit(1).cast("bigint"),
        ).alias("k_lo"),
        F.least(
            F.ceil(
                F.col("n") / 2.0 + 1 + 1.959964 * F.sqrt(F.col("n") / 4.0)
            ).cast("bigint"),
            F.col("n"),
        ).alias("k_hi"),
    )
    picks = ranked.select("r", "cents").join(
        F.broadcast(ks),
        (F.col("r") == F.col("k_med_lo"))
        | (F.col("r") == F.col("k_med_hi"))
        | (F.col("r") == F.col("k_lo"))
        | (F.col("r") == F.col("k_hi")),
    )
    return picks.groupBy("n").agg(
        F.round(
            (
                F.max(F.when(F.col("r") == F.col("k_med_lo"), F.col("cents")))
                + F.max(F.when(F.col("r") == F.col("k_med_hi"), F.col("cents")))
            )
            / 200.0,
            6,
        ).alias("median_spend"),
        F.round(
            F.max(F.when(F.col("r") == F.col("k_lo"), F.col("cents"))) / 100.0, 6
        ).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("r") == F.col("k_hi"), F.col("cents"))) / 100.0, 6
        ).alias("ci_hi"),
    ).select(
        F.col("n").alias("n_customers"), "median_spend", "ci_lo", "ci_hi"
    )


_PERM_B = 64


@query(
    "stats_permutation_test",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'view')
    ), sizes AS (
      SELECT CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS na,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM ev
    ), obs AS (
      SELECT CAST(SUM(cents) FILTER (WHERE event_type = 'click') AS DOUBLE)
               / COUNT(*) FILTER (WHERE event_type = 'click')
             - CAST(SUM(cents) FILTER (WHERE event_type = 'view') AS DOUBLE)
               / COUNT(*) FILTER (WHERE event_type = 'view') AS d_obs
      FROM ev
    ), perms AS (
      SELECT b.b, e.cents,
             (CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':'
                                   || CAST(b.b AS VARCHAR)), 1, 15)) AS BIGINT)
              % s.nt) < s.na AS in_a
      FROM ev e, UNNEST(range(0, {_PERM_B})) AS b(b), sizes s
    ), pd AS (
      SELECT b,
             CAST(SUM(cents) FILTER (WHERE in_a) AS DOUBLE)
               / COUNT(*) FILTER (WHERE in_a)
             - CAST(SUM(cents) FILTER (WHERE NOT in_a) AS DOUBLE)
               / COUNT(*) FILTER (WHERE NOT in_a) AS d
      FROM perms GROUP BY b
    )
    SELECT s.na AS n_click, s.nt - s.na AS n_view,
           ROUND(o.d_obs, 6) AS observed_diff_cents,
           CAST({_PERM_B} AS INT) AS n_perms,
           CAST(COUNT(*) FILTER (WHERE ABS(pd.d) >= ABS(o.d_obs)) AS BIGINT)
             AS n_extreme,
           CAST(COUNT(*) FILTER (WHERE ABS(pd.d) >= ABS(o.d_obs)) + 1 AS DOUBLE)
             / ({_PERM_B} + 1) AS p_value
    FROM pd, obs o, sizes s
    GROUP BY s.na, s.nt, o.d_obs
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-DETERMINISTIC PERMUTATION TEST (randomization inference) —
    does mean revenue differ between click and view events, judged
    against the null distribution built by RELABELING: 64 pseudo-
    permutations assign each event to group A with the exact marginal
    rate n_click/n_total via the INTEGER test hash(event_id, b) % n_total
    < n_click — no float threshold, both engines draw identical
    assignments (the same md5-derived portable hash as the Poisson
    bootstrap). All 64 permuted mean differences fall out of ONE explode
    + map-side-combinable aggregate (never 64 shuffles); the p-value is
    the add-one-smoothed extreme fraction ((#|d_b| ≥ |d_obs|)+1)/(B+1),
    exact integers over exact cents sums, one double division at the
    end. The distribution-free sibling of stats_welch_t_sources /
    stats_bootstrap_poisson_ci on the experimentation shelf."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    ev = e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    # sizes and the observed difference fall out of ONE 1-row aggregate
    # (they were two separate corpus scans; the permutation explode below
    # is the third — now second — pass over events)
    sizes = ev.agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("bigint")
        .alias("na"),
        F.count("*").cast("bigint").alias("nt"),
        (
            F.sum(F.when(F.col("event_type") == "click", F.col("cents")))
            .cast("double")
            / F.count(F.when(F.col("event_type") == "click", 1))
            - F.sum(F.when(F.col("event_type") == "view", F.col("cents")))
            .cast("double")
            / F.count(F.when(F.col("event_type") == "view", 1))
        ).alias("d_obs"),
    ).localCheckpoint(eager=False)
    obs = sizes.select("d_obs")
    perms = (
        ev.crossJoin(F.broadcast(sizes))
        .select(
            "event_id",
            "cents",
            "na",
            "nt",
            F.explode(F.array([F.lit(b) for b in range(_PERM_B)])).alias("b"),
        )
        .select(
            "b",
            "cents",
            (
                portable_hash64(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                )
                % F.col("nt")
                < F.col("na")
            ).alias("in_a"),
        )
    )
    pd = perms.groupBy("b").agg(
        (
            F.sum(F.when(F.col("in_a"), F.col("cents"))).cast("double")
            / F.count(F.when(F.col("in_a"), 1))
            - F.sum(F.when(~F.col("in_a"), F.col("cents"))).cast("double")
            / F.count(F.when(~F.col("in_a"), 1))
        ).alias("d")
    )
    extreme = (
        pd.crossJoin(F.broadcast(obs))
        .agg(
            F.count(
                F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1)
            )
            .cast("bigint")
            .alias("n_extreme")
        )
    )
    return (
        extreme.crossJoin(F.broadcast(sizes))
        .select(
            F.col("na").alias("n_click"),
            (F.col("nt") - F.col("na")).alias("n_view"),
            F.round("d_obs", 6).alias("observed_diff_cents"),
            F.lit(_PERM_B).cast("int").alias("n_perms"),
            "n_extreme",
            (
                (F.col("n_extreme") + 1).cast("double") / (_PERM_B + 1)
            ).alias("p_value"),
        )
    )


@query(
    "stats_forecast_backtest_mase",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT day, cents,
             LAG(cents, 7) OVER (ORDER BY day) AS snaive,
             LAG(cents, 1) OVER (ORDER BY day) AS naive1
      FROM daily
    ), scored AS (
      SELECT ABS(cents - snaive) AS e_snaive,
             ABS(cents - naive1) AS e_naive1
      FROM lagged WHERE snaive IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           ROUND(CAST(SUM(e_snaive) AS BIGINT) / 100.0 / COUNT(*), 6)
             AS mae_seasonal_naive,
           ROUND(CAST(SUM(e_naive1) AS BIGINT) / 100.0 / COUNT(*), 6)
             AS mae_naive1,
           ROUND(CAST(SUM(e_snaive) AS DOUBLE) / SUM(e_naive1), 6) AS mase
    FROM scored
    """,
)
def stats_forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTEST with MASE (Hyndman & Koehler 2006) — the
    scale-free accuracy metric that makes forecast models comparable
    across series: seasonal-naive (value 7 days ago) scored against the
    one-step naive baseline on the same scored days, MASE = Σ|e_snaive|
    / Σ|e_naive1| (< 1 ⇒ the weekly-seasonal model beats naive drift —
    the go/no-go gate a forecasting pipeline runs before promoting any
    model, here backtesting the seasonality the holt/seasonal queries
    model). Errors are exact integer cents; the bounded ~30-day domain
    rides one ordered window over the daily aggregate (calendar-bounded,
    the COVERAGE.md whitelist class)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "cents",
        F.lag("cents", 7).over(w).alias("snaive"),
        F.lag("cents", 1).over(w).alias("naive1"),
    ).where(F.col("snaive").isNotNull())
    scored = lagged.select(
        F.abs(F.col("cents") - F.col("snaive")).alias("e_snaive"),
        F.abs(F.col("cents") - F.col("naive1")).alias("e_naive1"),
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_days_scored"),
        F.round(
            F.sum("e_snaive").cast("bigint") / 100.0 / F.count("*"), 6
        ).alias("mae_seasonal_naive"),
        F.round(
            F.sum("e_naive1").cast("bigint") / 100.0 / F.count("*"), 6
        ).alias("mae_naive1"),
        F.round(
            F.sum("e_snaive").cast("double") / F.sum("e_naive1"), 6
        ).alias("mase"),
    )


@query(
    "stats_mcnemar_paired",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_a,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_b
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT CAST(SUM(CASE WHEN did_a = 1 AND did_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN did_a = 1 AND did_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN did_a = 0 AND did_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN did_a = 0 AND did_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM per_user
    )
    SELECT n11, n10, n01, n00,
           ROUND(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                 / NULLIF(n10 + n01, 0), 6) AS chi2,
           ROUND(CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1) AS DOUBLE)
                 / NULLIF(n10 + n01, 0), 6) AS chi2_cc,
           CASE WHEN CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                     / NULLIF(n10 + n01, 0) > 3.841458820694124
                THEN 1 ELSE 0 END AS reject_at_05
    FROM cells
    """,
)
def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST FOR PAIRED BINARY OUTCOMES — the within-subject
    sibling of the two-proportion z-test the experimentation shelf
    already carries: for each user, did they click (outcome A) and did
    they purchase (outcome B)? Only the DISCORDANT cells matter
    (χ² = (n10 − n01)²/(n10 + n01), plus Edwards' continuity-corrected
    variant), so the test isolates users who changed behavior — the
    correct analysis when both measurements come from the SAME subject
    and the z-test's independence assumption breaks. One user-keyed
    aggregate to the 2×2 concordance table (map-side combinable), then
    exact-integer cell arithmetic with a single rounded division; the
    χ²₁ critical value 3.8415 is a literal in both engines."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("did_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("did_b"),
    )
    cells = per_user.agg(
        F.sum(F.when((F.col("did_a") == 1) & (F.col("did_b") == 1), 1).otherwise(0)).cast("bigint").alias("n11"),
        F.sum(F.when((F.col("did_a") == 1) & (F.col("did_b") == 0), 1).otherwise(0)).cast("bigint").alias("n10"),
        F.sum(F.when((F.col("did_a") == 0) & (F.col("did_b") == 1), 1).otherwise(0)).cast("bigint").alias("n01"),
        F.sum(F.when((F.col("did_a") == 0) & (F.col("did_b") == 0), 1).otherwise(0)).cast("bigint").alias("n00"),
    )
    d = F.col("n10") - F.col("n01")
    denom = F.nullif(F.col("n10") + F.col("n01"), F.lit(0))
    chi2 = (d * d).cast("double") / denom
    cc = (F.abs(d) - 1) * (F.abs(d) - 1)
    return cells.select(
        "n11", "n10", "n01", "n00",
        F.round(chi2, 6).alias("chi2"),
        F.round(cc.cast("double") / denom, 6).alias("chi2_cc"),
        F.when(chi2 > 3.841458820694124, 1).otherwise(0).alias("reject_at_05"),
    )


@query(
    "events_quantile_treatment_effect",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_q
      FROM events GROUP BY user_id
    ), qs AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(quantile_cont(v_q, 0.25) / 10000, 6) AS q25,
             ROUND(quantile_cont(v_q, 0.50) / 10000, 6) AS q50,
             ROUND(quantile_cont(v_q, 0.75) / 10000, 6) AS q75
      FROM per_user GROUP BY arm
    )
    SELECT t.n AS n_treat, c.n AS n_ctrl,
           ROUND(t.q25 - c.q25, 6) AS qte_25,
           ROUND(t.q50 - c.q50, 6) AS qte_50,
           ROUND(t.q75 - c.q75, 6) AS qte_75,
           t.q50 AS treat_median, c.q50 AS ctrl_median
    FROM (SELECT * FROM qs WHERE arm = 1) t, (SELECT * FROM qs WHERE arm = 0) c
    """,
)
def events_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS — the distributional readout a
    mean-diff A/B test hides: at each quartile of per-user total value,
    how much does the treatment arm (synthetic hash split user_id % 2,
    the repo's standard deterministic assignment) shift the quantile?
    QTE(p) = q_T(p) − q_C(p); a lift concentrated in qte_75 with flat
    qte_25 means the treatment moves whales, not typical users. Per-user
    values are 1e4-quantized integers BEFORE the quantile (so the
    interpolation arithmetic is over identical integers in both engines);
    quantiles are per-arm keyed aggregates — no global window — and the
    final QTE row joins two single-row arms."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("v_q"),
    ).select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("arm"), "v_q"
    )
    qs = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY v_q)") / 10000, 6).alias("q25"),
        F.round(F.expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY v_q)") / 10000, 6).alias("q50"),
        F.round(F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY v_q)") / 10000, 6).alias("q75"),
    )
    t = qs.where(F.col("arm") == 1).alias("t")
    c = qs.where(F.col("arm") == 0).alias("c")
    return t.crossJoin(F.broadcast(c)).select(
        F.col("t.n").alias("n_treat"),
        F.col("c.n").alias("n_ctrl"),
        F.round(F.col("t.q25") - F.col("c.q25"), 6).alias("qte_25"),
        F.round(F.col("t.q50") - F.col("c.q50"), 6).alias("qte_50"),
        F.round(F.col("t.q75") - F.col("c.q75"), 6).alias("qte_75"),
        F.col("t.q50").alias("treat_median"),
        F.col("c.q50").alias("ctrl_median"),
    )


@query(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS grp,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), med AS (
      SELECT grp, quantile_cont(cents, 0.5) AS m FROM x GROUP BY grp
    ), z AS (
      SELECT x.grp,
             CAST(2 * ABS(CAST(x.cents AS DOUBLE) - med.m) AS BIGINT) AS z2
      FROM x JOIN med USING (grp)
    ), g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(z2) AS BIGINT) AS s,
             CAST(SUM(CAST(z2 AS DECIMAL(38,0)) * z2) AS DECIMAL(38,0)) AS q
      FROM z GROUP BY grp
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ), terms AS (
      SELECT g.grp, g.n, g.s, tot.nt, tot.k,
             CAST(FLOOR(g.n * POWER(CAST(g.s AS DOUBLE) / g.n
                                    - CAST(tot.st AS DOUBLE) / tot.nt, 2)
                        / 1024 + 0.5) AS BIGINT) AS ssb_q,
             CAST(FLOOR((CAST(g.q AS DOUBLE)
                         - CAST(g.s AS DOUBLE) * g.s / g.n)
                        / 1024 + 0.5) AS BIGINT) AS ssw_q
      FROM g, tot
    ), w AS (
      SELECT CAST(MAX(nt) AS BIGINT) AS n_total,
             CAST(MAX(k) AS BIGINT) AS n_groups,
             FLOOR(((MAX(nt) - MAX(k)) * CAST(SUM(ssb_q) AS DOUBLE))
                   / ((MAX(k) - 1) * CAST(SUM(ssw_q) AS DOUBLE))
                   * 1000000 + 0.5) / 1000000 AS w_stat
      FROM terms
    )
    SELECT t.grp AS o_orderpriority, t.n AS n_rows,
           FLOOR(CAST(t.s AS DOUBLE) / (2 * t.n) * 1000000 + 0.5) / 1000000
             AS mean_absdev_cents,
           w.n_total, w.n_groups, w.w_stat
    FROM terms t, w
    """,
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE / LEVENE TEST for variance homogeneity across the
    five order-priority groups — the assumption check every ANOVA user
    (stats_anova_dow_revenue) should run first: W = ((N-k)/(k-1)) *
    SSB(z)/SSW(z) where z_ij = |x_ij - median_j| (the median-centered
    Brown-Forsythe variant, robust to non-normality; Levene 1960 /
    Brown & Forsythe 1974). Cross-engine discipline: cents via the
    house FLOOR quantizer; z doubled into exact half-cent BIGINTs (a
    median of an integer sample is a .0/.5 value, so 2z is integer);
    Sz2**2 kept in DECIMAL(38,0) (z2 ~ 1.2e7 squared * row count passes
    2^63 at sf>=0.1 - the dual-SF moment gate applies); each group's SSB
    and SSW contribution quantized to a BIGINT in 1024-half-cent^2 units
    BEFORE the 5-term cross-group sum (per-term discipline - a 5-row
    float SUM is still order-dependent; /1024 is an exact power-of-two
    rescale that keeps the BIGINT under 2^63 at any SF and cancels in
    the SSB/SSW ratio; Spark FLOOR(double) RETURNS a BIGINT, so the
    quantizer itself must not exceed long range). Shape at 100 TB: one keyed agg for medians,
    one keyed agg for moments, then 5-row algebra under a broadcast -
    no global window, no second corpus pass."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    med = x.groupBy("grp").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)").alias("m")
    )
    z = x.join(med, "grp").select(
        "grp",
        (2 * F.abs(F.col("cents").cast("double") - F.col("m"))).cast("bigint").alias("z2"),
    )
    # r13: the 5-row per-group moment table feeds the grand total AND the
    # final algebra join — checkpoint it so the median + moment corpus
    # aggregations run once (16 parquet scans → 4 in the plan)
    g = z.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("z2").cast("bigint").alias("s"),
        F.sum(F.col("z2").cast("decimal(38,0)") * F.col("z2")).cast("decimal(38,0)").alias("q"),
    ).localCheckpoint(eager=False)
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("s").cast("bigint").alias("st"),
        F.count("*").cast("bigint").alias("k"),
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "grp", "n", "s", "nt", "k",
        F.floor(
            F.col("n")
            * F.pow(
                F.col("s").cast("double") / F.col("n")
                - F.col("st").cast("double") / F.col("nt"),
                2,
            )
            / 1024
            + F.lit(0.5)
        ).cast("bigint").alias("ssb_q"),
        F.floor(
            (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / 1024
            + F.lit(0.5)
        ).cast("bigint").alias("ssw_q"),
    )
    w = terms.agg(
        F.max("nt").cast("bigint").alias("n_total"),
        F.max("k").cast("bigint").alias("n_groups"),
        (
            F.floor(
                ((F.max("nt") - F.max("k")) * F.sum("ssb_q").cast("double"))
                / ((F.max("k") - 1) * F.sum("ssw_q").cast("double"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("w_stat"),
    )
    return terms.select(
        F.col("grp").alias("o_orderpriority"),
        F.col("n").alias("n_rows"),
        (
            F.floor(
                F.col("s").cast("double") / (2 * F.col("n")) * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("mean_absdev_cents"),
    ).crossJoin(F.broadcast(w))


@query(
    "stats_ljung_box_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS r
      FROM orders GROUP BY 1
    ), seq AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, r FROM daily
    ), diff AS (
      SELECT a.t - 1 AS t, a.r - b.r AS x
      FROM seq a JOIN seq b ON a.t = b.t + 1
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM diff
    ), lagk AS (
      SELECT k.k, CAST(COUNT(*) AS BIGINT) AS npair,
             CAST(SUM(CAST(a.x AS DECIMAL(38,0)) * b.x) AS DECIMAL(38,0)) AS sab,
             CAST(SUM(a.x) AS BIGINT) AS sa, CAST(SUM(b.x) AS BIGINT) AS sb
      FROM UNNEST(range(1, 11)) AS k(k)
      JOIN diff a ON TRUE JOIN diff b ON b.t = a.t + k.k
      GROUP BY k.k
    ), rho AS (
      SELECT l.k,
             FLOOR((CAST(l.sab AS DOUBLE)
                    - CAST(m.sx AS DOUBLE) / m.n * l.sb
                    - CAST(m.sx AS DOUBLE) / m.n * l.sa
                    + l.npair * POWER(CAST(m.sx AS DOUBLE) / m.n, 2))
                   / (CAST(m.sxx AS DOUBLE)
                      - CAST(m.sx AS DOUBLE) * m.sx / m.n)
                   * 1000000000 + 0.5) AS rho_q,
             m.n
      FROM lagk l, m
    )
    , qterm AS (
      SELECT n, CAST(FLOOR(POWER(rho_q / 1000000000, 2) / (n - k)
                           * 1000000000000000 + 0.5) AS BIGINT) AS tq
      FROM rho
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_obs,
           CAST(COUNT(*) AS INT) AS n_lags,
           FLOOR(MAX(n) * (MAX(n) + 2.0)
                 * (CAST(SUM(tq) AS DOUBLE) / 1000000000000000)
                 * 1000000 + 0.5) / 1000000 AS q_stat
    FROM qterm
    """,
)
def stats_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX PORTMANTEAU TEST (Ljung & Box 1978) on first-differenced
    daily revenue: Q = n(n+2) * sum_{k=1..10} rho_k^2/(n-k), the standard
    'is anything left in the residuals' white-noise check that a
    forecasting pipeline (stats_forecast_backtest_mase,
    stats_acf_daily_revenue) runs after fitting - large Q rejects
    independence. All moments are exact: daily revenue is an exact cents
    BIGINT, first differences are exact integers, and every cross/self
    moment (sum x_t*x_{t+k}) accumulates in DECIMAL(38,0) (cents-level
    daily sums squared pass 2^63 comfortably - dual-SF moment gate
    applies). rho_k is computed from exact integer moments with the
    identical expression order in both engines, 1e9-quantized, and each
    lag's Q contribution is 1e15-quantized to a BIGINT BEFORE the
    10-term sum (per-term discipline at both accumulation points). Scale shape: one
    calendar-bounded daily agg, then day-domain self-joins (the proven
    lag-join shape of stats_acf_daily_revenue) - nothing corpus-scaled
    ever re-shuffles."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("r")
    )
    w = Window.orderBy("d")
    # days are calendar-bounded (a global window over <= ~2,500 rows at any
    # SF) but still routed through a keyed shape: diff against lag-1 join
    seq = daily.select(F.row_number().over(w).alias("t"), "r")
    a = seq.alias("a")
    b = seq.alias("b")
    # r14: diff feeds the global moment agg AND both sides of the 10-lag
    # join — three derivations of the daily rollup + lag join (12 parquet
    # scans). The table is day-domain-sized; materialize it once (§2.4).
    diff = (
        a.join(b, F.col("a.t") == F.col("b.t") + 1)
        .select((F.col("a.t") - 1).alias("t"), (F.col("a.r") - F.col("b.r")).alias("x"))
    ).localCheckpoint(eager=False)
    m = diff.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    ks = spark.range(1, 11).select(F.col("id").cast("bigint").alias("k"))
    da = diff.alias("da")
    db = diff.alias("db")
    lagk = (
        F.broadcast(ks)
        .join(da, F.lit(True))
        .join(db, F.col("db.t") == F.col("da.t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("npair"),
            F.sum(F.col("da.x").cast("decimal(38,0)") * F.col("db.x"))
            .cast("decimal(38,0)")
            .alias("sab"),
            F.sum("da.x").cast("bigint").alias("sa"),
            F.sum("db.x").cast("bigint").alias("sb"),
        )
    )
    rho = lagk.crossJoin(F.broadcast(m)).select(
        "k",
        "n",
        F.floor(
            (
                F.col("sab").cast("double")
                - F.col("sx").cast("double") / F.col("n") * F.col("sb")
                - F.col("sx").cast("double") / F.col("n") * F.col("sa")
                + F.col("npair")
                * F.pow(F.col("sx").cast("double") / F.col("n"), 2)
            )
            / (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n")
            )
            * 1000000000
            + F.lit(0.5)
        ).alias("rho_q"),
    )
    qterm = rho.select(
        "n",
        F.floor(
            F.pow(F.col("rho_q") / 1000000000, 2)
            / (F.col("n") - F.col("k"))
            * 1000000000000000
            + F.lit(0.5)
        ).cast("bigint").alias("tq"),
    )
    return qterm.agg(
        F.max("n").cast("bigint").alias("n_obs"),
        F.count("*").cast("int").alias("n_lags"),
        (
            F.floor(
                F.max("n")
                * (F.max("n") + 2.0)
                * (F.sum("tq").cast("double") / 1000000000000000)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("q_stat"),
    )
