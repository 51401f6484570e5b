"""Multi-touch attribution: exact Shapley values and Markov-chain
removal effects over the events journey data.

Both are bounded-domain analytics (the channel set is the distinct
event_type domain, 4 non-conversion channels here), so the combinatorial
/ matrix machinery is tiny and deterministic — the DISTRIBUTED work is
the per-user journey construction (exposure sets, ordered transitions)
over the full events fact table; the channel-level solve runs on
aggregate tables of at most 2^n / n² rows.

Float-parity discipline (SCALE.md): every term that enters a cross-row
SUM is quantized to an exact 1e12-scaled BIGINT first (FLOOR(x·1e12 +
0.5) in both engines), so no floating sum ever depends on accumulation
order; probabilities are exact-integer ratios; multiplication order is
written identically in Spark and SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_CONVERSION = "purchase"
_Q = 1_000_000_000_000  # 1e12 term quantizer
_K = 40  # fixed absorption horizon (see events_attribution_markov_removal)


def _channels(spark: SparkSession, sf_dir: str) -> list[str]:
    """Distinct non-conversion event types, alphabetical — the bounded
    channel domain (4 values in the testdata generations; the oracle SQL
    pins the same ordering via DENSE_RANK ORDER BY event_type)."""
    e = load_table(spark, sf_dir, "events")
    rows = (
        e.where(F.col("event_type") != _CONVERSION)
        .select("event_type")
        .distinct()
        .collect()
    )
    return sorted(r["event_type"] for r in rows)


@query(
    "events_attribution_shapley",
    oracle=f"""
    WITH chans AS (
      SELECT event_type AS ch,
             CAST(DENSE_RANK() OVER (ORDER BY event_type) - 1 AS INT) AS idx
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type <> '{_CONVERSION}')
    ), usr AS (
      SELECT e.user_id,
             CAST(COALESCE(bit_or(CASE WHEN c.idx IS NOT NULL
                                       THEN (1 << c.idx) END), 0) AS INT) AS mask,
             MAX(CASE WHEN e.event_type = '{_CONVERSION}' THEN 1 ELSE 0 END) AS conv
      FROM events e LEFT JOIN chans c ON e.event_type = c.ch
      GROUP BY e.user_id
    ), vstats AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(conv) AS BIGINT) AS conv
      FROM usr GROUP BY mask
    ), subsets AS (
      SELECT CAST(s AS INT) AS s FROM UNNEST(range(0, 16)) t(s)
    ), v AS (
      SELECT s.s,
             COALESCE(CAST(vs.conv AS DOUBLE) / vs.cnt, 0.0) AS v
      FROM subsets s LEFT JOIN vstats vs ON vs.mask = s.s
    ), pairs AS (
      SELECT c.ch, c.idx, s.s AS s0, s.s + (1 << c.idx) AS s1,
             bit_count(s.s) AS ssize
      FROM chans c, subsets s
      WHERE (s.s >> c.idx) & 1 = 0
    ), terms AS (
      SELECT p.ch,
             CAST(FLOOR(
               (CAST(factorial(p.ssize) * factorial(4 - 1 - p.ssize) AS DOUBLE)
                  / factorial(4))
               * (v1.v - v0.v) * {_Q} + 0.5) AS BIGINT) AS tq
      FROM pairs p
      JOIN v v1 ON v1.s = p.s1
      JOIN v v0 ON v0.s = p.s0
    ), exposed AS (
      SELECT c.ch, CAST(SUM(vs.cnt) AS BIGINT) AS exposed_users
      FROM chans c JOIN vstats vs ON (vs.mask >> c.idx) & 1 = 1
      GROUP BY c.ch
    )
    SELECT t.ch AS channel,
           ex.exposed_users,
           ROUND(CAST(SUM(t.tq) AS BIGINT) / {_Q}.0, 6) AS shapley_value
    FROM terms t JOIN exposed ex ON ex.ch = t.ch
    GROUP BY t.ch, ex.exposed_users
    """,
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SHAPLEY-VALUE ATTRIBUTION — each channel's marginal
    contribution to conversion, averaged over all orderings (the
    cooperative-game credit split, the principled alternative to
    first/last/linear touch): φᵢ = Σ_{S∌i} |S|!(n−1−|S|)!/n! ·
    (v(S∪i) − v(S)), with v(S) = conversion rate of users exposed to
    exactly channel set S. The distributed stage builds per-user
    exposure bitmasks (bit_or over hashed channel bits) and converts
    them to 2^n subset statistics with one aggregate; the Shapley sum
    then runs over the n·2^(n-1) (channel, subset) lattice — 32 rows
    here, a bounded domain like the repo's months/hours whitelist
    classes. Factorial weights are exact-integer ratios, v(S) exact
    count ratios, and every lattice term is 1e12-quantized before the
    per-channel sum, so neither engine's float accumulation order can
    leak into the hash. The oracle hardcodes n=4 / 2^n=16 (the stable
    event-type domain of the testdata, like the ANN literal twins); the
    Spark side derives n from data, so a drifted domain must FAIL LOUDLY
    here rather than silently hash-mismatch against the n=4 oracle.
    Practical ceiling of the exact lattice is n ≤ 12 (12·2^11 = 24,576
    driver-side terms); past that, use sampled-permutation Shapley."""
    chans = _channels(spark, sf_dir)
    n = len(chans)
    if n != 4:
        raise ValueError(
            f"events_attribution_shapley: the registered oracle pins the "
            f"n=4 channel domain of the test events table, got n={n} "
            f"({chans}); regenerate the oracle lattice for the new domain "
            f"(exact Shapley is practical to n<=12)"
        )
    e = load_table(spark, sf_dir, "events")

    bit = F.lit(None).cast("int")
    for i, ch in enumerate(chans):
        bit = F.when(F.col("event_type") == ch, F.lit(1 << i)).otherwise(bit)
    usr = (
        e.select(
            "user_id",
            bit.alias("bit"),
            F.when(F.col("event_type") == _CONVERSION, 1).otherwise(0).alias("cv"),
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.expr("bit_or(bit)"), F.lit(0)).cast("int").alias("mask"),
            F.max("cv").alias("conv"),
        )
    )
    # r14: vstats fed the subset-value table (which v1 AND v0 re-derive)
    # plus the exposed-users rollup — the per-user bit_or corpus
    # aggregation ran up to four times (6 parquet scans). The table is
    # ≤2^n rows; materialize it once (§2.4).
    vstats = usr.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("conv").cast("bigint").alias("conv"),
    ).localCheckpoint(eager=False)
    v = (
        spark.range(1 << n)
        .select(F.col("id").cast("int").alias("s"))
        .join(vstats, F.col("s") == F.col("mask"), "left")
        .select(
            "s",
            F.coalesce(
                F.col("conv").cast("double") / F.col("cnt"), F.lit(0.0)
            ).alias("v"),
        )
    )
    pairs = spark.createDataFrame(
        [
            (
                ch,
                i,
                s,
                s | (1 << i),
                math.factorial(bin(s).count("1"))
                * math.factorial(n - 1 - bin(s).count("1"))
                / math.factorial(n),
            )
            for i, ch in enumerate(chans)
            for s in range(1 << n)
            if not (s >> i) & 1
        ],
        ["ch", "idx", "s0", "s1", "w"],
    )
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    terms = (
        pairs.join(v1, "s1")
        .join(v0, "s0")
        .select(
            "ch",
            F.floor(
                (F.col("w") * (F.col("v1") - F.col("v0"))) * F.lit(float(_Q)) + 0.5
            )
            .cast("bigint")
            .alias("tq"),
        )
    )
    exposed = (
        spark.createDataFrame(
            [(ch, i) for i, ch in enumerate(chans)], ["ch", "idx"]
        )
        .join(vstats, F.expr("(mask >> idx) & 1 = 1"))
        .groupBy("ch")
        .agg(F.sum("cnt").cast("bigint").alias("exposed_users"))
    )
    return (
        terms.groupBy("ch")
        .agg(
            F.round(F.sum("tq").cast("bigint") / F.lit(float(_Q)), 6).alias(
                "shapley_value"
            )
        )
        .join(exposed, "ch")
        .select(
            F.col("ch").alias("channel"), "exposed_users", "shapley_value"
        )
    )


def _markov_oracle() -> str:
    """Unrolled 40-step quantized absorption iteration (the same shape as
    graph.py::_pagerank_oracle's unrolled power iterations): every
    per-term product FLOOR(p·q + 0.5) is an exact BIGINT before any SUM,
    so the iteration is bit-reproducible regardless of either engine's
    accumulation order."""
    step = """
    q{k} AS MATERIALIZED (
      SELECT g.rm, g.state,
             CASE WHEN g.state = 'CONV' THEN CAST({Q} AS BIGINT)
                  WHEN g.state = 'NULL' THEN CAST(0 AS BIGINT)
                  WHEN g.state = g.rm THEN CAST(0 AS BIGINT)
                  ELSE COALESCE(s.nq, 0) END AS q
      FROM grid g LEFT JOIN (
        SELECT q.rm, t.src AS state,
               CAST(SUM(CAST(FLOOR(t.p * CAST(q.q AS DOUBLE) + 0.5)
                             AS BIGINT)) AS BIGINT) AS nq
        FROM tprob t JOIN q{prev} q ON q.state = t.dst
        GROUP BY q.rm, t.src
      ) s ON s.rm = g.rm AND s.state = g.state
    )"""
    iters = ",".join(
        step.format(k=i, prev=i - 1, Q=_Q) for i in range(1, _K + 1)
    )
    return f"""
    WITH chans AS (
      SELECT DISTINCT event_type AS ch FROM events
      WHERE event_type <> '{_CONVERSION}'
    ), ev AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), firstp AS (
      SELECT user_id, MIN(rn) AS prn FROM ev
      WHERE event_type = '{_CONVERSION}' GROUP BY user_id
    ), j AS (
      SELECT e.user_id, e.rn,
             CASE WHEN e.event_type = '{_CONVERSION}' THEN 'CONV'
                  ELSE e.event_type END AS state
      FROM ev e LEFT JOIN firstp f ON e.user_id = f.user_id
      WHERE f.prn IS NULL OR e.rn <= f.prn
    ), hops AS (
      SELECT user_id, rn, state,
             COALESCE(LAG(state) OVER (PARTITION BY user_id ORDER BY rn),
                      'START') AS prev,
             MAX(rn) OVER (PARTITION BY user_id) AS maxrn
      FROM j
    ), trans AS (
      SELECT prev AS src, state AS dst FROM hops
      UNION ALL
      SELECT state AS src, 'NULL' AS dst FROM hops
      WHERE rn = maxrn AND state <> 'CONV'
    ), tcnt AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM trans GROUP BY src, dst
    ), tprob AS MATERIALIZED (
      SELECT src, dst,
             CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY src) AS p
      FROM tcnt
    ), states AS (
      SELECT DISTINCT src AS state FROM tcnt
      UNION SELECT 'CONV' UNION SELECT 'NULL'
    ), variants AS (
      SELECT 'BASE' AS rm UNION ALL SELECT ch FROM chans
    ), grid AS MATERIALIZED (
      SELECT v.rm, s.state FROM variants v, states s
    ), q0 AS MATERIALIZED (
      SELECT rm, state,
             CASE WHEN state = 'CONV' THEN CAST({_Q} AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS q
      FROM grid
    ),
    {iters},
    final AS (SELECT rm, q FROM q{_K} WHERE state = 'START'),
    base AS (SELECT q AS qb FROM final WHERE rm = 'BASE')
    SELECT c.ch AS channel,
           CAST(base.qb AS DOUBLE) / {_Q} AS p_base,
           CAST(r.q AS DOUBLE) / {_Q} AS p_removed,
           CAST(base.qb - r.q AS DOUBLE) / NULLIF(base.qb, 0)
             AS removal_effect
    FROM chans c JOIN final r ON r.rm = c.ch, base
    """


@query("events_attribution_markov_removal", oracle=_markov_oracle())
def events_attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016, the
    data-driven alternative to rule-based touch credit): model journeys
    as a first-order Markov chain over channels with absorbing CONV /
    NULL states, then credit each channel by how much the conversion
    probability drops when that state is removed (its inbound mass
    falls through to NULL). The DISTRIBUTED work is journey
    construction over the full events table — per-user row_number,
    truncation at first purchase, lag-based transition pairs, terminal
    →NULL hops, all user-partitioned windows — reduced to a transition
    table bounded by (channels+2)². The absorption solve then runs on
    that bounded matrix driver-side (a documented bounded-domain
    collect, like the repo's months²/pool² cases): a FIXED-HORIZON
    40-step value iteration where every per-term product is quantized
    to an exact 1e12 BIGINT via FLOOR(p·q + 0.5) before summation —
    bit-identical to the oracle's 40 unrolled SQL iterations by
    construction, convergence not required for parity. Removing state c
    = pinning q(c)=0 each round (paths through c are lost). Final
    probabilities are single exact-int divisions — no float sums, no
    rounding anywhere."""
    e = load_table(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w_rn).alias("rn"),
    )
    firstp = (
        ev.where(F.col("event_type") == _CONVERSION)
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = (
        ev.join(firstp, "user_id", "left")
        .where(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .select(
            "user_id",
            "rn",
            F.when(F.col("event_type") == _CONVERSION, "CONV")
            .otherwise(F.col("event_type"))
            .alias("state"),
        )
    )
    w_u = Window.partitionBy("user_id").orderBy("rn")
    w_all = Window.partitionBy("user_id")
    hops = j.select(
        "rn",
        "state",
        F.coalesce(F.lag("state").over(w_u), F.lit("START")).alias("prev"),
        F.max("rn").over(w_all).alias("maxrn"),
    )
    trans = hops.select(
        F.col("prev").alias("src"), F.col("state").alias("dst")
    ).unionByName(
        hops.where(
            (F.col("rn") == F.col("maxrn")) & (F.col("state") != "CONV")
        ).select(F.col("state").alias("src"), F.lit("NULL").alias("dst"))
    )
    tcnt = trans.groupBy("src", "dst").agg(F.count("*").alias("cnt"))
    # Bounded-domain collect: ≤ (channels+2)² rows regardless of SF.
    rows = tcnt.collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["src"]] = totals.get(r["src"], 0) + r["cnt"]
    tprob = {(r["src"], r["dst"]): r["cnt"] / totals[r["src"]] for r in rows}
    states = sorted({s for s, _ in tprob} | {"CONV", "NULL"})
    channels = sorted({s for s, _ in tprob} - {"START"})

    def solve(removed: str | None) -> int:
        q = {s: (_Q if s == "CONV" else 0) for s in states}
        for _ in range(_K):
            nq = {}
            for s in states:
                if s == "CONV":
                    nq[s] = _Q
                elif s == "NULL" or s == removed:
                    nq[s] = 0
                else:
                    nq[s] = sum(
                        math.floor(p * float(q[t]) + 0.5)
                        for (src, t), p in tprob.items()
                        if src == s
                    )
            q = nq
        return q["START"]

    qb = solve(None)
    out = [
        (
            ch,
            qb / _Q,
            solve(ch) / _Q,
            (qb - solve(ch)) / qb if qb else None,
        )
        for ch in channels
    ]
    return spark.createDataFrame(
        out, ["channel", "p_base", "p_removed", "removal_effect"]
    )


@query(
    "events_attribution_position",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), firstp AS (
      SELECT user_id, MIN(rn) AS prn FROM ev
      WHERE event_type = '{_CONVERSION}' GROUP BY user_id
    ), touches AS (
      SELECT e.user_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.rn) AS pos,
             COUNT(*) OVER (PARTITION BY e.user_id) AS k
      FROM ev e JOIN firstp f
        ON e.user_id = f.user_id AND e.rn < f.prn
      WHERE e.event_type <> '{_CONVERSION}'
    ), credited AS (
      SELECT event_type,
             CAST(FLOOR((CASE
               WHEN k = 1 THEN 1.0
               WHEN k = 2 THEN 0.5
               WHEN pos = 1 THEN 0.4
               WHEN pos = k THEN 0.4
               ELSE 0.2 / (k - 2)
             END) * 1000000 + 0.5) AS BIGINT) AS credit_micro
      FROM touches
    )
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(credit_micro) AS BIGINT) / 1000000.0, 6)
             AS credited_conversions
    FROM credited GROUP BY event_type
    """,
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-SHAPED) ATTRIBUTION — the 40/20/40 rule-based
    member completing the attribution shelf next to linear, Shapley and
    Markov removal: for each converting user's pre-purchase touch
    sequence, the first and last touches get 0.4 conversions each and
    the middle splits 0.2 evenly (k=1 → 1.0, k=2 → 0.5/0.5). Touch
    positions come from user-partitioned row_number windows; the
    data-dependent middle share 0.2/(k−2) is quantized per touch with
    FLOOR(c·1e6 + 0.5) — the identical IEEE op in both engines — so the
    per-channel credit sums are exact integers (the SCALE.md rule: no
    raw float ever crosses a SUM)."""
    e = load_table(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.select(
        "user_id", "event_type", F.row_number().over(w_rn).alias("rn")
    )
    firstp = (
        ev.where(F.col("event_type") == _CONVERSION)
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    touches = (
        ev.join(firstp, "user_id")
        .where((F.col("rn") < F.col("prn")) & (F.col("event_type") != _CONVERSION))
        .select(
            "user_id",
            "event_type",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("rn"))
            .alias("pos"),
            F.count("*").over(Window.partitionBy("user_id")).alias("k"),
        )
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("k"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    credited = touches.select(
        "event_type",
        F.floor(credit * 1000000 + 0.5).cast("bigint").alias("credit_micro"),
    )
    return credited.groupBy(F.col("event_type").alias("channel")).agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.round(F.sum("credit_micro").cast("bigint") / 1000000.0, 6).alias(
            "credited_conversions"
        ),
    )
