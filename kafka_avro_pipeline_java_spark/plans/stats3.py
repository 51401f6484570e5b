"""Time-series and effect-size statistics (round 9).

Reference: dkwkehgud77/kafka-avro-pipeline-java has no analytics surface
(its only SQL is DDL + INSERT/upsert, DataPipeline.java); these extend the
mandated north-star BI/statistics shelf. Oracle discipline (see stats2.py):
exact BIGINT/decimal(38,0) moments, 1e9 fixed-point quantization per
transcendental term, identical IEEE expression trees both engines, final
doubles rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

_Q = 1_000_000_000

_DAILY_SQL = """
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("rev")
    )


@query(
    "stats_mann_kendall_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), s AS (
      SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b ON a.d < b.d
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
    ), ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_sum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY rev)
      WHERE t > 1
    )
    SELECT n.n AS n_days, s.s_stat,
           ROUND(CAST(s.s_stat AS DOUBLE)
                 / (0.5 * CAST(n.n AS DOUBLE) * CAST(n.n - 1 AS DOUBLE)),
                 6) AS kendall_tau,
           ROUND(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_sum
                      AS DOUBLE) / 18.0, 6) AS var_s,
           ROUND((CAST(s.s_stat AS DOUBLE)
                  - CASE WHEN s.s_stat > 0 THEN 1.0
                         WHEN s.s_stat < 0 THEN -1.0 ELSE 0.0 END)
                 / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_sum
                             AS DOUBLE) / 18.0), 6) AS mk_z
    FROM s, n, ties
    """,
)
def stats_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL trend test on daily revenue — the distribution-free
    "is this series monotonically drifting" check (S = Σ sign(xⱼ−xᵢ)
    over ordered day pairs) that regression-slope tests get wrong under
    heavy tails; the standard companion to stats_theil_sen_trend's slope
    (same S statistic family). S and the tie-corrected variance are
    exact BIGINT integer algebra; z applies the ±1 continuity
    correction. The pair join is over the DAY-aggregated series — the
    date domain is fixed by the dataset's time span, so the O(days²)
    join is bounded at every SF (document-discipline: bounded means
    bounded by the VALUE DOMAIN, not the corpus)."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat")
        )
    )
    n = daily.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("rev")
        .agg(F.count("*").cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("bigint").alias("tie_sum")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    nn, ss = F.col("n"), F.col("s_stat")
    var_d = (
        (nn * (nn - 1) * (2 * nn + 5) - F.col("tie_sum")).cast("double")
        / 18.0
    )
    cc = (
        F.when(ss > 0, F.lit(1.0))
        .when(ss < 0, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        nn.alias("n_days"),
        ss.alias("s_stat"),
        F.round(
            ss.cast("double") / (0.5 * nn.cast("double") * (nn - 1).cast("double")),
            6,
        ).alias("kendall_tau"),
        F.round(var_d, 6).alias("var_s"),
        F.round((ss.cast("double") - cc) / F.sqrt(var_d), 6).alias("mk_z"),
    )


@query(
    "stats_acf_daily_revenue",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), rn AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rev) AS s, SUM(CAST(rev AS HUGEINT) * rev) AS s2
      FROM rn
    ), lagged AS (
      SELECT CAST(b.i - a.i AS INT) AS lag,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(a.rev AS HUGEINT) * b.rev) AS c,
             SUM(a.rev) AS h, SUM(b.rev) AS t
      FROM rn a JOIN rn b ON b.i - a.i BETWEEN 1 AND 7
      GROUP BY 1
    )
    SELECT lag,
           ROUND((CAST(c AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(h AS DOUBLE) + CAST(t AS DOUBLE))
                  + CAST(m AS DOUBLE)
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (CAST(s2 AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS acf
    FROM lagged, g ORDER BY lag
    """,
)
def stats_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample AUTOCORRELATION of daily revenue at lags 1–7 — the full
    dependence fingerprint behind every forecasting decision (weekly
    seasonality shows as a lag-7 spike), generalizing
    stats_autocorr_revenue's single monthly lag-1 to the multi-lag
    daily ACF; the runs test sees only signs, ACF sees magnitude. Standard estimator rₖ = Σ(xₜ−x̄)(xₜ₊ₖ−x̄)/
    Σ(xₜ−x̄)², expanded so every data-dependent sum is EXACT integer
    algebra: Σxₜxₜ₊ₖ / head & tail sums / counts per lag from one
    band-join on day rank (decimal(38,0) on the Spark side matches
    DuckDB's HUGEINT promotion — Σrev² outgrows int64 past sf0.1); the
    only doubles are the constant-count closed form, identical trees
    both engines. Day rank uses a window over the DATE-domain-bounded
    daily table."""
    dec = "decimal(38,0)"
    daily = _daily(spark, sf_dir)
    rn = daily.select(
        "rev", F.row_number().over(Window.orderBy("d")).alias("i")
    ).localCheckpoint(eager=False)
    g = rn.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("rev").cast(dec)).alias("s"),
        F.sum(F.col("rev").cast(dec) * F.col("rev")).alias("s2"),
    )
    a, b = rn.alias("a"), rn.alias("b")
    lagged = (
        a.join(
            b,
            (F.col("b.i") - F.col("a.i") >= 1)
            & (F.col("b.i") - F.col("a.i") <= 7),
        )
        .groupBy((F.col("b.i") - F.col("a.i")).cast("int").alias("lag"))
        .agg(
            F.count("*").cast("bigint").alias("m"),
            F.sum(F.col("a.rev").cast(dec) * F.col("b.rev")).alias("c"),
            F.sum(F.col("a.rev").cast(dec)).alias("h"),
            F.sum(F.col("b.rev").cast(dec)).alias("t"),
        )
    )
    xb = F.col("s").cast("double") / F.col("n").cast("double")
    num = (
        F.col("c").cast("double")
        - xb * (F.col("h").cast("double") + F.col("t").cast("double"))
        + F.col("m").cast("double") * xb * xb
    )
    den = F.col("s2").cast("double") - F.col("n").cast("double") * xb * xb
    return (
        lagged.crossJoin(F.broadcast(g))
        .select("lag", F.round(num / den, 6).alias("acf"))
        .orderBy("lag")
    )


@query(
    "stats_cohens_d_sources",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(n_chars AS BIGINT)) AS s1,
             SUM(CAST(n_chars AS BIGINT) * n_chars) AS s2
      FROM documents GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           ROUND((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                 / SQRT((CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                           / CAST(a.n AS DOUBLE)
                         + CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE)
                           / CAST(b.n AS DOUBLE))
                        / CAST(a.n + b.n - 2 AS DOUBLE)), 6) AS cohens_d,
           ROUND((CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                 / SQRT((CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                           / CAST(a.n AS DOUBLE)
                         + CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE)
                           / CAST(b.n AS DOUBLE))
                        / CAST(a.n + b.n - 2 AS DOUBLE))
                 * (1.0 - 3.0 / (4.0 * CAST(a.n + b.n AS DOUBLE) - 9.0)),
                 6) AS hedges_g
    FROM m a JOIN m b ON a.source < b.source
    """,
)
def stats_cohens_d_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S D (pooled-SD standardized mean difference) and the
    small-sample HEDGES' G correction (J = 1 − 3/(4N−9)) for document
    length between every pair of ingestion sources — the effect-SIZE
    companion to stats_welch_t_sources' significance: a t of 40 on a
    billion docs can be a d of 0.01 nobody should act on. One pass of
    exact BIGINT moments per source (map-side combined), then the
    source×source closed form on the handful-sized moment table —
    identical expression trees both engines, rounded at 6."""
    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("s1"),
        F.sum(F.col("n_chars").cast("bigint") * F.col("n_chars")).alias("s2"),
    )
    a, b = m.alias("a"), m.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    mean_diff = (
        F.col("a.s1").cast("double") / an.cast("double")
        - F.col("b.s1").cast("double") / bn.cast("double")
    )
    pooled_sd = F.sqrt(
        (
            (an * F.col("a.s2") - F.col("a.s1") * F.col("a.s1")).cast("double")
            / an.cast("double")
            + (bn * F.col("b.s2") - F.col("b.s1") * F.col("b.s1")).cast("double")
            / bn.cast("double")
        )
        / (an + bn - 2).cast("double")
    )
    j_corr = 1.0 - 3.0 / (4.0 * (an + bn).cast("double") - 9.0)
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.round(mean_diff / pooled_sd, 6).alias("cohens_d"),
            F.round(mean_diff / pooled_sd * j_corr, 6).alias("hedges_g"),
        )
    )


@query(
    "stats_anova_dow_revenue",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), dow AS (
      SELECT CAST(CAST(d - DATE '1970-01-01' AS INT) % 7 AS INT) AS dow,
             rev
      FROM daily
    ), per AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rev) AS s, SUM(CAST(rev AS HUGEINT) * rev) AS s2
      FROM dow GROUP BY dow
    ), g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s, SUM(s2) AS s2,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM per
    ), ss AS (
      SELECT g.n, g.k,
             SUM(CAST(per.s AS DOUBLE) * per.s / per.n)
               - CAST(g.s AS DOUBLE) * g.s / g.n AS ss_between,
             CAST(g.s2 AS DOUBLE)
               - CAST(g.s AS DOUBLE) * g.s / g.n AS ss_total
      FROM per, g GROUP BY g.n, g.k, g.s, g.s2
    )
    SELECT CAST(k AS INT) AS n_groups, n AS n_days,
           ROUND(ss_between / ss_total, 6) AS eta_sq,
           ROUND((ss_between / CAST(k - 1 AS DOUBLE))
                 / ((ss_total - ss_between) / CAST(n - k AS DOUBLE)),
                 6) AS f_stat
    FROM ss
    """,
)
def stats_anova_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily revenue by DAY OF WEEK — the "is weekly
    seasonality real" F-test plus η² effect share (the fraction of
    daily-revenue variance the weekday explains), the decomposition
    check behind stats_acf_daily_revenue's lag-7 reading. Weekday
    classes come from portable integer arithmetic (days-since-epoch mod
    7 — engines disagree on dayofweek() origins, integers don't);
    per-class moments are exact (HUGEINT/decimal(38,0) for Σrev²), and
    the between/total sum-of-squares closed form runs on the 7-row
    moment table with identical trees. Map-side combine all the way —
    one scalar exchange at 100 TB."""
    dec = "decimal(38,0)"
    daily = _daily(spark, sf_dir)
    dow = daily.select(
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int").alias("dow"),
        "rev",
    )
    per = dow.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("rev").cast(dec)).alias("s"),
        F.sum(F.col("rev").cast(dec) * F.col("rev")).alias("s2"),
    )
    g = per.agg(
        F.sum("n").cast("bigint").alias("gn"),
        F.sum("s").alias("gs"),
        F.sum("s2").alias("gs2"),
        F.count("*").cast("bigint").alias("k"),
    )
    ss = (
        per.crossJoin(F.broadcast(g))
        .groupBy("gn", "k", "gs", "gs2")
        .agg(
            (
                F.sum(
                    F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                - F.first(
                    F.col("gs").cast("double") * F.col("gs") / F.col("gn")
                )
            ).alias("ss_between"),
            (
                F.first(F.col("gs2").cast("double"))
                - F.first(
                    F.col("gs").cast("double") * F.col("gs") / F.col("gn")
                )
            ).alias("ss_total"),
        )
    )
    k, n = F.col("k"), F.col("gn")
    return ss.select(
        k.cast("int").alias("n_groups"),
        n.alias("n_days"),
        F.round(F.col("ss_between") / F.col("ss_total"), 6).alias("eta_sq"),
        F.round(
            (F.col("ss_between") / (k - 1).cast("double"))
            / (
                (F.col("ss_total") - F.col("ss_between"))
                / (n - k).cast("double")
            ),
            6,
        ).alias("f_stat"),
    )


@query(
    "stats_entropy_rate_events",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ), cells AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), rows_t AS (
      SELECT cur, c,
             CAST(SUM(c) OVER (PARTITION BY cur) AS BIGINT) AS row_c,
             CAST(SUM(c) OVER () AS BIGINT) AS tot
      FROM cells
    )
    SELECT CAST(COUNT(*) AS INT) AS n_cells,
           MAX(tot) AS n_transitions,
           ROUND(CAST(SUM(CAST(ROUND(
             -(CAST(c AS DOUBLE) / tot)
               * LN(CAST(c AS DOUBLE) / row_c) / LN(2.0) * {_Q}, 0)
             AS BIGINT)) AS DOUBLE) / {_Q}, 6) AS entropy_rate_bits
    FROM rows_t
    """,
)
def stats_entropy_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plug-in Markov ENTROPY RATE of the per-user event-type chain —
    H = −Σᵢⱼ p(i,j)·log₂ p(j|i) with empirical joint and conditional
    frequencies: how predictable the next action is given the current
    one (0 bits = deterministic funnels, log₂k = pure noise) — the
    single-number summary of events_transition_matrix and the
    information-theoretic floor for next-event-prediction models.
    Transitions from a per-user window (partitioned — fact-scaled but
    never single-partition, deterministic (ts, event_id) order); each
    −p·log₂ term is 1e9-fixed-point quantized on the type×type-bounded
    cell table then integer-summed (the agg_entropy_by_dimension
    discipline)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cells = seq.groupBy("cur", "nxt").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_row = Window.partitionBy("cur")
    w_all = Window.partitionBy()
    rows_t = cells.select(
        "c",
        F.sum("c").over(w_row).cast("bigint").alias("row_c"),
        F.sum("c").over(w_all).cast("bigint").alias("tot"),
    )
    term = F.round(
        -(F.col("c").cast("double") / F.col("tot"))
        * F.log(F.col("c").cast("double") / F.col("row_c"))
        / F.log(F.lit(2.0))
        * _Q,
        0,
    ).cast("bigint")
    return rows_t.select("tot", term.alias("tq")).agg(
        F.count("*").cast("int").alias("n_cells"),
        F.max("tot").alias("n_transitions"),
        F.round(F.sum("tq").cast("double") / _Q, 6).alias(
            "entropy_rate_bits"
        ),
    )


# Abramowitz & Stegun 26.2.17 normal-tail polynomial: |err| < 7.5e-8 and —
# what actually matters for the oracle — the IDENTICAL literal expression
# tree in both engines, so the p-values agree to the last bit.
_BH_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_BH_ALPHA = 0.05

_BH_Z_SQL = """(CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                 / SQRT(CAST(a.n * a.s2 - a.s1 * a.s1 AS DOUBLE)
                          / CAST(a.n AS DOUBLE) / CAST(a.n AS DOUBLE)
                          / CAST(a.n - 1 AS DOUBLE)
                        + CAST(b.n * b.s2 - b.s1 * b.s1 AS DOUBLE)
                          / CAST(b.n AS DOUBLE) / CAST(b.n AS DOUBLE)
                          / CAST(b.n - 1 AS DOUBLE))"""


@query(
    "stats_fdr_bh_sources",
    oracle=f"""
    WITH m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(n_chars AS BIGINT)) AS s1,
             SUM(CAST(n_chars AS BIGINT) * n_chars) AS s2
      FROM documents GROUP BY source
    ), z AS (
      SELECT a.source AS src_a, b.source AS src_b,
             {_BH_Z_SQL} AS z
      FROM m a JOIN m b ON a.source < b.source
    ), p AS (
      SELECT src_a, src_b, z,
             2.0 * (EXP(-z * z / 2.0) / SQRT(2.0 * PI()))
                 * ((1.0 / (1.0 + 0.2316419 * ABS(z)))
                    * ({_BH_B[0]!r}
                       + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                         * ({_BH_B[1]!r}
                            + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                              * ({_BH_B[2]!r}
                                 + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                                   * ({_BH_B[3]!r}
                                      + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                                        * {_BH_B[4]!r}))))) AS p
      FROM z
    ), ranked AS (
      SELECT src_a, src_b, z, p,
             ROW_NUMBER() OVER (ORDER BY p, src_a, src_b) AS i,
             COUNT(*) OVER () AS mm
      FROM p
    )
    SELECT src_a, src_b,
           ROUND(z, 6) AS welch_z,
           ROUND(p, 6) AS p_value,
           ROUND(MIN(LEAST(mm * p / i, 1.0)) OVER (
             ORDER BY i DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS p_adjusted,
           CAST(MIN(LEAST(mm * p / i, 1.0)) OVER (
             ORDER BY i DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             <= {_BH_ALPHA!r} AS BOOLEAN) AS rejected
    FROM ranked
    """,
)
def stats_fdr_bh_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI–HOCHBERG false-discovery-rate control over the 190
    source-pair Welch tests — the multiple-testing correction without
    which the experimentation shelf's per-pair p-values are fiction (at
    α=0.05, ~10 of 190 true-null pairs would "reject" by chance; BH caps
    the EXPECTED false-discovery fraction instead of Bonferroni's
    family-wise overkill). Welch z from exact BIGINT moments; two-sided
    p from the A&S 26.2.17 normal-tail polynomial (identical literal
    Horner tree both engines — no erf() dependency in either); adjusted
    p = the classic step-up running min of m·p/i from the bottom rank.
    The rank/adjust windows run over the SOURCE-PAIR table — bounded by
    the source-domain square, not the corpus — and the moment pass rides
    map-side combine."""
    import math

    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("s1"),
        F.sum(F.col("n_chars").cast("bigint") * F.col("n_chars")).alias("s2"),
    )
    a, b = m.alias("a"), m.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    z_expr = (
        F.col("a.s1").cast("double") / an.cast("double")
        - F.col("b.s1").cast("double") / bn.cast("double")
    ) / F.sqrt(
        (an * F.col("a.s2") - F.col("a.s1") * F.col("a.s1")).cast("double")
        / an.cast("double") / an.cast("double") / (an - 1).cast("double")
        + (bn * F.col("b.s2") - F.col("b.s1") * F.col("b.s1")).cast("double")
        / bn.cast("double") / bn.cast("double") / (bn - 1).cast("double")
    )
    zt = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        z_expr.alias("z"),
    )
    t = 1.0 / (1.0 + 0.2316419 * F.abs(F.col("z")))
    horner = t * (
        _BH_B[0]
        + t * (_BH_B[1] + t * (_BH_B[2] + t * (_BH_B[3] + t * _BH_B[4])))
    )
    pdf = F.exp(-F.col("z") * F.col("z") / 2.0) / F.sqrt(
        F.lit(2.0) * F.lit(math.pi)
    )
    pt = zt.select("src_a", "src_b", "z", (2.0 * pdf * horner).alias("p"))
    w_rank = Window.orderBy("p", "src_a", "src_b")
    ranked = pt.select(
        "src_a", "src_b", "z", "p",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("mm"),
    )
    w_adj = Window.orderBy(F.desc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = F.min(
        F.least(F.col("mm") * F.col("p") / F.col("i"), F.lit(1.0))
    ).over(w_adj)
    return ranked.select(
        "src_a",
        "src_b",
        F.round("z", 6).alias("welch_z"),
        F.round("p", 6).alias("p_value"),
        F.round(adj, 6).alias("p_adjusted"),
        (adj <= _BH_ALPHA).alias("rejected"),
    )


def _holm_oracle() -> str:
    # identical Welch-z + A&S 26.2.17 p-value pipeline as the BH oracle,
    # with Holm's STEP-DOWN adjustment: running max (from the smallest p)
    # of min((m - i + 1) * p, 1).
    b = _BH_B
    return f"""
    WITH m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(n_chars AS BIGINT)) AS s1,
             SUM(CAST(n_chars AS BIGINT) * n_chars) AS s2
      FROM documents GROUP BY source
    ), z AS (
      SELECT a.source AS src_a, b.source AS src_b,
             {_BH_Z_SQL} AS z
      FROM m a JOIN m b ON a.source < b.source
    ), p AS (
      SELECT src_a, src_b, z,
             2.0 * (EXP(-z * z / 2.0) / SQRT(2.0 * PI()))
                 * ((1.0 / (1.0 + 0.2316419 * ABS(z)))
                    * ({b[0]!r}
                       + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                         * ({b[1]!r}
                            + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                              * ({b[2]!r}
                                 + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                                   * ({b[3]!r}
                                      + (1.0 / (1.0 + 0.2316419 * ABS(z)))
                                        * {b[4]!r}))))) AS p
      FROM z
    ), ranked AS (
      SELECT src_a, src_b, z, p,
             ROW_NUMBER() OVER (ORDER BY p, src_a, src_b) AS i,
             COUNT(*) OVER () AS mm
      FROM p
    )
    SELECT src_a, src_b,
           ROUND(z, 6) AS welch_z,
           ROUND(p, 6) AS p_value,
           ROUND(MAX(LEAST((mm - i + 1) * p, 1.0)) OVER (
             ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS p_adjusted,
           CAST(MAX(LEAST((mm - i + 1) * p, 1.0)) OVER (
             ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             <= {_BH_ALPHA!r} AS BOOLEAN) AS rejected
    FROM ranked
    """


@query("stats_holm_bonferroni", oracle=_holm_oracle())
def stats_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLM-BONFERRONI STEP-DOWN correction (Holm 1979) over the same 190
    source-pair Welch tests as stats_fdr_bh_sources - the FWER-controlling
    member of the multiple-testing shelf: where BH caps the EXPECTED
    false-discovery fraction (step-UP running min of m*p/i from the
    largest p), Holm guarantees P(any false rejection) <= alpha with
    uniformly more power than plain Bonferroni (step-DOWN running max of
    (m-i+1)*p from the smallest p; adjusted p is monotone by
    construction). Identical exact-BIGINT Welch moments and the identical
    A&S 26.2.17 normal-tail Horner tree as BH, so a MATCH here pins the
    adjustment algebra specifically. The rank/adjust windows run over the
    bounded source-pair table (20 sources -> 190 rows), never the
    corpus."""
    import math

    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("s1"),
        F.sum(F.col("n_chars").cast("bigint") * F.col("n_chars")).alias("s2"),
    )
    a, b = m.alias("a"), m.alias("b")
    an, bn = F.col("a.n"), F.col("b.n")
    z_expr = (
        F.col("a.s1").cast("double") / an.cast("double")
        - F.col("b.s1").cast("double") / bn.cast("double")
    ) / F.sqrt(
        (an * F.col("a.s2") - F.col("a.s1") * F.col("a.s1")).cast("double")
        / an.cast("double") / an.cast("double") / (an - 1).cast("double")
        + (bn * F.col("b.s2") - F.col("b.s1") * F.col("b.s1")).cast("double")
        / bn.cast("double") / bn.cast("double") / (bn - 1).cast("double")
    )
    zt = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        z_expr.alias("z"),
    )
    t = 1.0 / (1.0 + 0.2316419 * F.abs(F.col("z")))
    horner = t * (
        _BH_B[0]
        + t * (_BH_B[1] + t * (_BH_B[2] + t * (_BH_B[3] + t * _BH_B[4])))
    )
    pdf = F.exp(-F.col("z") * F.col("z") / 2.0) / F.sqrt(
        F.lit(2.0) * F.lit(math.pi)
    )
    pt = zt.select("src_a", "src_b", "z", (2.0 * pdf * horner).alias("p"))
    w_rank = Window.orderBy("p", "src_a", "src_b")
    ranked = pt.select(
        "src_a", "src_b", "z", "p",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("mm"),
    )
    w_adj = Window.orderBy(F.asc("i")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adj = F.max(
        F.least((F.col("mm") - F.col("i") + 1) * F.col("p"), F.lit(1.0))
    ).over(w_adj)
    return ranked.select(
        "src_a",
        "src_b",
        F.round("z", 6).alias("welch_z"),
        F.round("p", 6).alias("p_value"),
        F.round(adj, 6).alias("p_adjusted"),
        (adj <= _BH_ALPHA).alias("rejected"),
    )


_RM_PER_USER_SQL = """
      SELECT CAST(user_id % 2 AS INT) AS grp,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
"""

_RM_MOMENTS_SQL = """
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy, SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM per_user GROUP BY grp
"""


@query(
    "stats_ratio_metric_delta",
    oracle=f"""
    WITH per_user AS ({_RM_PER_USER_SQL}
    ), moments AS ({_RM_MOMENTS_SQL}
    ), est AS (
      SELECT grp,
             CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
             (CAST(n * sxx - sx * sx AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
              + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * CAST(n * syy - sy * sy AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
              - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                * CAST(n * sxy - sx * sy AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
             / (CAST(n AS DOUBLE)
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) AS var_r
      FROM moments
    )
    SELECT ROUND(a.r, 6) AS ratio_control,
           ROUND(b.r, 6) AS ratio_treatment,
           ROUND(b.r - a.r, 6) AS diff,
           ROUND(SQRT(a.var_r + b.var_r), 6) AS se,
           ROUND((b.r - a.r) / SQRT(a.var_r + b.var_r), 6) AS z
    FROM est a, est b WHERE a.grp = 0 AND b.grp = 1
    """,
)
def stats_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA-METHOD inference for a RATIO metric (revenue per event,
    user-clustered) — the experimentation-shelf member CUPED doesn't
    cover: per-arm R = Σx/Σy is a ratio of per-USER sums, so its
    variance is NOT Var(x̄) (events within a user correlate); the
    first-order delta expansion Var(R) ≈ (Var x + R²·Var y −
    2R·Cov(x,y)) / (n·ȳ²) is how every A/B platform ships ratio-metric
    p-values (Deng et al., KDD'18). Per-user collapse rides map-side
    combine; five decimal(38,0)/HUGEINT moments per arm; the closed
    form is constant-count double algebra on identical trees, rounded
    at 6."""
    dec = "decimal(38,0)"
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint").alias("x"),
        F.count("*").cast("bigint").alias("y"),
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "x", "y")
    moments = per_user.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = sx / sy
    nm1 = (F.col("n") - 1).cast("double")

    def cmom(sab, sa, sb):
        return (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)).cast(
            "double"
        ) / (n * nm1)

    var_r = (
        cmom("sxx", "sx", "sx")
        + r * r * cmom("syy", "sy", "sy")
        - 2.0 * r * cmom("sxy", "sx", "sy")
    ) / (n * (sy / n) * (sy / n))
    est = moments.select("grp", r.alias("r"), var_r.alias("var_r"))
    a = est.filter(F.col("grp") == 0).select(
        F.col("r").alias("ra"), F.col("var_r").alias("va")
    )
    b = est.filter(F.col("grp") == 1).select(
        F.col("r").alias("rb"), F.col("var_r").alias("vb")
    )
    return a.crossJoin(b).select(
        F.round("ra", 6).alias("ratio_control"),
        F.round("rb", 6).alias("ratio_treatment"),
        F.round(F.col("rb") - F.col("ra"), 6).alias("diff"),
        F.round(F.sqrt(F.col("va") + F.col("vb")), 6).alias("se"),
        F.round(
            (F.col("rb") - F.col("ra")) / F.sqrt(F.col("va") + F.col("vb")),
            6,
        ).alias("z"),
    )


_Z_ALPHA = 1.959963984540054   # Phi^-1(0.975)
_Z_BETA = 0.8416212335729143   # Phi^-1(0.80)


@query(
    "stats_power_analysis",
    oracle=f"""
    WITH per_user AS ({_RM_PER_USER_SQL}
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(CAST(x AS HUGEINT) * x) AS sxx,
             CAST(SUM(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM per_user
    ), s AS (
      SELECT n, n0, n1,
             SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd,
             ABS(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS delta
      FROM m
    )
    SELECT ROUND(sd, 6) AS pooled_sd_cents,
           ROUND(delta, 6) AS observed_diff_cents,
           CAST(CEIL(2.0 * sd * sd
                     * ({_Z_ALPHA!r} + {_Z_BETA!r})
                     * ({_Z_ALPHA!r} + {_Z_BETA!r})
                     / (delta * delta)) AS BIGINT) AS n_required_per_arm,
           ROUND(({_Z_ALPHA!r} + {_Z_BETA!r})
                 * SQRT(2.0 * sd * sd / CAST(LEAST(n0, n1) AS DOUBLE)),
                 6) AS mde_at_current_n
    FROM s
    """,
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B POWER ANALYSIS (design side of the experimentation shelf):
    from the observed per-user revenue distribution, the sample size per
    arm needed to detect the currently-observed arm difference at
    α=0.05 / power 0.8 — n = 2σ²(z_crit+z_power)²/δ² — and the minimum
    detectable effect at the CURRENT arm sizes. The z quantiles are
    literal doubles (no inverse-CDF dependency in either engine); σ and
    δ come from exact BIGINT/HUGEINT moments in one pass; the closed
    form is identical trees rounded at 6, the required n an exact CEIL.
    The answer every 'how long must this test run' conversation needs,
    next to stats_ab_srm_check's validity gate and
    stats_ratio_metric_delta's analysis-side inference."""
    dec = "decimal(38,0)"
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint").alias("x"),
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "x")
    m = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.when(F.col("grp") == 1, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx0"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0"),
    )
    n = F.col("n")
    sd = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / (n.cast("double") * (n - 1).cast("double"))
    )
    delta = F.abs(
        F.col("sx1").cast("double") / F.col("n1").cast("double")
        - F.col("sx0").cast("double") / F.col("n0").cast("double")
    )
    zsum = F.lit(_Z_ALPHA) + F.lit(_Z_BETA)
    s = m.select(
        "n0", "n1", sd.alias("sd"), delta.alias("delta")
    )
    return s.select(
        F.round("sd", 6).alias("pooled_sd_cents"),
        F.round("delta", 6).alias("observed_diff_cents"),
        F.ceil(
            2.0 * F.col("sd") * F.col("sd") * zsum * zsum
            / (F.col("delta") * F.col("delta"))
        ).cast("bigint").alias("n_required_per_arm"),
        F.round(
            zsum
            * F.sqrt(
                2.0 * F.col("sd") * F.col("sd")
                / F.least("n0", "n1").cast("double")
            ),
            6,
        ).alias("mde_at_current_n"),
    )


@query(
    "stats_wilson_ci_event_rates",
    oracle=f"""
    WITH counts AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, k,
           ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
           ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  + {_Z_ALPHA!r} * {_Z_ALPHA!r} / (2.0 * CAST(n AS DOUBLE))
                  - {_Z_ALPHA!r}
                    * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             / CAST(n AS DOUBLE)
                           + {_Z_ALPHA!r} * {_Z_ALPHA!r}
                             / (4.0 * CAST(n AS DOUBLE)
                                * CAST(n AS DOUBLE))))
                 / (1.0 + {_Z_ALPHA!r} * {_Z_ALPHA!r} / CAST(n AS DOUBLE)),
                 6) AS wilson_lo,
           ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                  + {_Z_ALPHA!r} * {_Z_ALPHA!r} / (2.0 * CAST(n AS DOUBLE))
                  + {_Z_ALPHA!r}
                    * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                             / CAST(n AS DOUBLE)
                           + {_Z_ALPHA!r} * {_Z_ALPHA!r}
                             / (4.0 * CAST(n AS DOUBLE)
                                * CAST(n AS DOUBLE))))
                 / (1.0 + {_Z_ALPHA!r} * {_Z_ALPHA!r} / CAST(n AS DOUBLE)),
                 6) AS wilson_hi
    FROM counts
    """,
)
def stats_wilson_ci_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE intervals for the per-event-type high-value rate
    (P(value > 50)) — the proportion CI that stays inside [0, 1] and
    behaves at k=0/k=n where the naive Wald interval collapses; the form
    every SLO / conversion-rate dashboard should use under small-n
    slices. Exact integer (n, k) per type from one map-side-combined
    agg; the closed form with the literal z (no inverse-CDF in either
    engine) on identical trees, rounded at 6."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
        .cast("bigint").alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z = F.lit(_Z_ALPHA)
    half = z * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    center = p + z * z / (2.0 * n)
    denom = 1.0 + z * z / n
    return counts.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "stats_gamma_fit_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT CAST(epoch_us(ts)
                  - LAG(epoch_us(ts)) OVER (ORDER BY ts, event_id)
                  AS BIGINT) AS g
      FROM events
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(g) AS s1, SUM(CAST(g AS HUGEINT) * g) AS s2
      FROM gaps WHERE g IS NOT NULL
    )
    SELECT n AS n_gaps,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
             AS mean_gap_sec,
           ROUND((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n * s2 - s1 * s1 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
             AS gamma_shape_k,
           ROUND((CAST(n * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                 / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 1000000.0, 6)
             AS gamma_scale_sec
    FROM m
    """,
)
def stats_gamma_fit_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments GAMMA FIT of global event interarrival times —
    k = mean²/var, θ = var/mean: the two-parameter arrival model behind
    queueing/capacity math when Poisson (k=1 exactly) is rejected, the
    parametric companion to stats_poisson_dispersion's test (k < 1 ⇔
    overdispersed/bursty, the same verdict events_burstiness reads
    nonparametrically). The GLOBAL time order is consumed only as
    consecutive differences, so it runs distributed: the two-phase
    row number (operators/ranking.py — never a single-partition lag
    over the fact table) followed by a self-join on adjacent ranks;
    moments are exact HUGEINT/decimal(38,0) microsecond sums; k and θ
    are constant-count double algebra on identical trees, seconds for
    readability."""
    from ..operators.ranking import attach_global_order_stats

    dec = "decimal(38,0)"
    e = load_table(spark, sf_dir, "events")
    rn = attach_global_order_stats(
        e.select(F.unix_micros(F.col("ts")).alias("t"), "event_id"),
        [("t", "asc"), ("event_id", "asc")],
        row_number="i",
    ).select("t", "i")
    a, b = rn.alias("a"), rn.alias("b")
    gaps = a.join(b, F.col("b.i") == F.col("a.i") + 1).select(
        (F.col("b.t") - F.col("a.t")).cast("bigint").alias("g")
    )
    m = gaps.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("g").cast(dec)).alias("s1"),
        F.sum(F.col("g").cast(dec) * F.col("g")).alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n.cast("double")
    var = (n * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        n.cast("double") * (n - 1).cast("double")
    )
    return m.select(
        n.alias("n_gaps"),
        F.round(mean / 1_000_000.0, 6).alias("mean_gap_sec"),
        F.round(mean * mean / var, 6).alias("gamma_shape_k"),
        F.round(var / mean / 1_000_000.0, 6).alias("gamma_scale_sec"),
    )
