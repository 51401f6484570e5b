"""Sketch queries: engine-portable approximate aggregates whose ESTIMATES
are oracle-checked value-for-value (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import sketches
from ..sources import load_table
from .registry import query

_K = 64
_HS = float(1 << 60)
_DEPTH = 3
_WIDTH = 1024


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT event_type AS g, user_id AS key FROM events
    ), hs AS (
      SELECT g,
             (CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
               / {_HS!r} AS h
      FROM pairs
    ), ranked AS (
      SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r FROM hs
    ), kept AS (
      SELECT g, MAX(h) AS hk, COUNT(*) AS n
      FROM ranked WHERE r <= {_K} GROUP BY g
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS td FROM events GROUP BY 1
    )
    SELECT k.g AS event_type,
           ROUND(CASE WHEN k.n < {_K} THEN CAST(k.n AS DOUBLE)
                      ELSE {_K - 1} / k.hk END, 4) AS est_distinct,
           CAST(e.td AS INT) AS true_distinct
    FROM kept k JOIN exact e ON e.event_type = k.g
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-user estimate per event type, next to the
    exact count — the engine-portable approximate-distinct whose ESTIMATE
    the oracle verifies bit-for-bit (vs `approx_distinct_customers`,
    whose HLL++ hash is engine-private and rows-only). One distinct
    shuffle + one per-group window over ≤ k ranks; sketch state is k
    8-byte hashes per group and merges associatively at scale."""
    e = load_table(spark, sf_dir, "events")
    est = sketches.kmv_distinct(e, "event_type", "user_id", k=_K)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("int").alias("true_distinct")
    )
    return est.join(exact, "event_type")


_HLL_M = 64
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 55)


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH hs AS (
      SELECT event_type AS g,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ), rho AS (
      SELECT g, h % {_HLL_M} AS bk,
             55 - len(list_filter(range(0, 54),
                                  p -> (1::BIGINT << p) <= (h // {_HLL_M}))) AS r
      FROM hs
    ), regs AS (
      SELECT g, bk, MAX(r) AS mj FROM rho GROUP BY g, bk
    ), per_g AS (
      SELECT g, SUM(1::BIGINT << (55 - mj)) AS isum, COUNT(*) AS occ
      FROM regs GROUP BY g
    ), filled AS (
      SELECT g,
             CAST(isum + ({_HLL_M} - occ) * (1::BIGINT << 55) AS BIGINT) AS isum,
             {_HLL_M} - occ AS v
      FROM per_g
    ), est AS (
      SELECT g, v, {_HLL_NUM!r} / CAST(isum AS DOUBLE) AS e_raw FROM filled
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS td FROM events GROUP BY 1
    )
    SELECT est.g AS event_type,
           ROUND(CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND v > 0
                      THEN {float(_HLL_M)!r} * LN({float(_HLL_M)!r} / v)
                      ELSE e_raw END, 4) AS est_distinct,
           CAST(exact.td AS INT) AS true_distinct
    FROM est JOIN exact ON exact.event_type = est.g
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type next to the exact
    count — the third sketch of the family, with integer-exact register
    math (Σ 2^(55−ρmax) as a BIGINT, order-independent) so even the
    harmonic-mean ESTIMATE is oracle-checked bit-for-bit. Register max is
    a map-side-combinable partial aggregate over m=64 cells per group —
    the cheapest mergeable distinct sketch at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    est = sketches.hll_distinct(e, "event_type", "user_id", m=_HLL_M)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("int").alias("true_distinct")
    )
    return est.join(exact, "event_type")


def _cm_pos_sql(expr: str, i: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({expr} || '#{i}'), 1, 15)) AS BIGINT) % {_WIDTH}"
    )


@query(
    "sketch_countmin_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), truec AS (
      SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY tok
    ), cells AS (
      SELECT i.i AS rw, CASE i.i
               WHEN 0 THEN {_cm_pos_sql("tok", 0)}
               WHEN 1 THEN {_cm_pos_sql("tok", 1)}
               ELSE {_cm_pos_sql("tok", 2)} END AS cl,
             COUNT(*) AS c
      FROM toks, UNNEST(range(0, {_DEPTH})) AS i(i)
      GROUP BY 1, 2
    ), top AS (
      SELECT tok, true_count FROM truec
      ORDER BY true_count DESC, tok LIMIT 20
    ), probe AS (
      SELECT tok, true_count, i.i AS rw, CASE i.i
               WHEN 0 THEN {_cm_pos_sql("tok", 0)}
               WHEN 1 THEN {_cm_pos_sql("tok", 1)}
               ELSE {_cm_pos_sql("tok", 2)} END AS cl
      FROM top, UNNEST(range(0, {_DEPTH})) AS i(i)
    )
    SELECT p.tok, CAST(MAX(p.true_count) AS BIGINT) AS true_count,
           CAST(MIN(c.c) AS BIGINT) AS est_count
    FROM probe p JOIN cells c ON c.rw = p.rw AND c.cl = p.cl
    GROUP BY p.tok
    """,
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=3 × m=1024) over the corpus token stream,
    probed at the top-20 true-frequency tokens: (tok, true_count,
    est_count), est ≥ true by construction. The sketch is one word-count
    aggregation into d·m cells — broadcast-sized no matter the corpus —
    and the probe join touches d cells per query token."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
    # r14 (guide §2.3/§2.4, the r13 item-11 type-count pattern): truec
    # feeds the top-k, the sketch build AND the final join — three
    # derivations of the corpus tokenize (8 parquet scans in the
    # before-plan). The TYPE-scale count table is materialized once and
    # the sketch derives from it WEIGHTED (cell = Σ true_count of the
    # tokens hashing there — the identical integer the raw stream
    # yields), so the corpus is tokenized exactly once.
    truec = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .localCheckpoint(eager=False)
    )
    top = truec.orderBy(F.desc("true_count"), "tok").limit(20)
    est = sketches.countmin_estimate(
        truec, "tok", top.select("tok"), "tok",
        depth=_DEPTH, width=_WIDTH, weight_col="true_count",
    )
    return (
        top.join(est, top.tok == est.probe)
        .select("tok", "true_count", "est_count")
    )


_JOIN_W = 16384


def _cm_pos_sql_w(expr: str, i: int, width: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({expr} || '#{i}'), 1, 15)) AS BIGINT) % {width}"
    )


@query(
    "sketch_join_cardinality",
    oracle=f"""
    WITH ea AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), ob AS (
      SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
    ), ca AS (
      SELECT i.i AS rw, CASE i.i
               WHEN 0 THEN {_cm_pos_sql_w("k", 0, _JOIN_W)}
               WHEN 1 THEN {_cm_pos_sql_w("k", 1, _JOIN_W)}
               ELSE {_cm_pos_sql_w("k", 2, _JOIN_W)} END AS cl,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ea, UNNEST(range(0, {_DEPTH})) AS i(i) GROUP BY 1, 2
    ), cb AS (
      SELECT i.i AS rw, CASE i.i
               WHEN 0 THEN {_cm_pos_sql_w("k", 0, _JOIN_W)}
               WHEN 1 THEN {_cm_pos_sql_w("k", 1, _JOIN_W)}
               ELSE {_cm_pos_sql_w("k", 2, _JOIN_W)} END AS cl,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ob, UNNEST(range(0, {_DEPTH})) AS i(i) GROUP BY 1, 2
    ), est AS (
      SELECT MIN(s) AS est_rows FROM (
        SELECT a.rw, SUM(a.c * b.c) AS s
        FROM ca a JOIN cb b ON a.rw = b.rw AND a.cl = b.cl
        GROUP BY a.rw
      )
    ), exact AS (
      SELECT COUNT(*) AS exact_rows
      FROM events e JOIN orders o ON o.o_custkey = e.user_id
    )
    SELECT CAST(est_rows AS BIGINT) AS est_rows,
           CAST(exact_rows AS BIGINT) AS exact_rows
    FROM est, exact
    """,
)
def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-style join-size estimation: predict |events ⋈ orders ON
    user_id = custkey| from two Count-Min sketches (min-row inner
    product, an upper bound — collisions only add), next to the exact
    join count. Width is sized to the signal: the collision noise floor
    is ‖a‖₁·‖b‖₁/w, so w=16384 puts it ~6% of the true size here (w=1024
    measured 2.4× over — the estimator is only as good as its width). Each side collapses to d·m counters before anything
    joins; the real join the estimator prices is run here only to show
    the estimate lands (operators/sketches.py::countmin_inner_product)."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("k")
    )
    est = sketches.countmin_inner_product(e, "k", o, "k", depth=_DEPTH, width=_JOIN_W)
    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    exact = ev.join(od, ev.user_id == od.o_custkey).agg(
        F.count("*").cast("bigint").alias("exact_rows")
    )
    return est.crossJoin(exact)


@query(
    "sketch_kmv_merge",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT event_type AS g, user_id AS key FROM events
    ), hs AS (
      SELECT g,
             (CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
               / {_HS!r} AS h
      FROM pairs
    ), per_group AS (
      SELECT g, h FROM (
        SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r FROM hs
      ) WHERE r <= {_K}
    ), merged AS (
      -- merge = union of the group sketches, dedup, re-take the k smallest
      SELECT h FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
        FROM (SELECT DISTINCT h FROM per_group)
      ) WHERE r <= {_K}
    ), est AS (
      SELECT MAX(h) AS hk, COUNT(*) AS n FROM merged
    ), exact AS (
      SELECT COUNT(DISTINCT user_id) AS td FROM events
    )
    SELECT ROUND(CASE WHEN est.n < {_K} THEN CAST(est.n AS DOUBLE)
                      ELSE {_K - 1} / est.hk END, 4) AS est_distinct_merged,
           CAST(exact.td AS INT) AS true_distinct
    FROM est, exact
    """,
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY, value-checked: the per-event-type KMV
    sketches (k smallest hashes each) are merged — union, dedup, re-take
    the k smallest — into ONE global distinct-user estimate, exactly the
    associative combine a 1000-executor partial aggregate performs. The
    merged estimate is compared against the exact global distinct
    computed alongside; the oracle reproduces every hash, so the claim
    'KMV merges associatively' is graded on VALUES, not trust."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        F.col("event_type").alias("g"), F.col("user_id").alias("key")
    ).distinct()
    hs = pairs.select(
        "g",
        ((sketches.portable_hash64(F.col("key").cast("string")) + 1) / F.lit(_HS)).alias("h"),
    )
    per_group = (
        hs.select("g", "h", F.row_number().over(
            Window.partitionBy("g").orderBy("h")).alias("r"))
        .filter(F.col("r") <= _K)
    )
    merged = (
        per_group.select("h").distinct()
        .select("h", F.row_number().over(Window.orderBy("h")).alias("r"))
        .filter(F.col("r") <= _K)
    )
    est = merged.agg(F.max("h").alias("hk"), F.count("*").alias("n"))
    exact = e.agg(F.count_distinct("user_id").cast("int").alias("true_distinct"))
    return est.crossJoin(exact).select(
        F.round(
            F.when(F.col("n") < _K, F.col("n").cast("double")).otherwise(
                (_K - 1) / F.col("hk")
            ),
            4,
        ).alias("est_distinct_merged"),
        "true_distinct",
    )


_HB = 256  # histogram buckets


@query(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS p FROM orders
    ), bounds AS (
      SELECT MIN(p) AS lo, MAX(p) AS hi FROM cents
    ), hist AS (
      SELECT LEAST(CAST(FLOOR((p - lo) * {_HB}.0 / (hi - lo + 1)) AS BIGINT),
                   {_HB - 1}) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM cents, bounds GROUP BY 1
    ), cum AS (
      SELECT b, c,
             SUM(c) OVER (ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS n
      FROM hist
    ), pick AS (
      SELECT q.q,
             MIN(b) FILTER (WHERE cum >= q.q * n) AS bq
      FROM cum, (SELECT UNNEST([0.5, 0.95]) AS q) q
      GROUP BY q.q
    ), exact AS (
      SELECT 0.5 AS q, quantile_cont(p, 0.5) AS ev FROM cents
      UNION ALL
      SELECT 0.95, quantile_cont(p, 0.95) FROM cents
    )
    SELECT CAST(p.q AS DOUBLE) AS quantile,
           ROUND((bo.lo + (p.bq + 0.5) * (bo.hi - bo.lo + 1) / {_HB}.0) / 100.0, 2)
             AS est_value,
           ROUND(e.ev / 100.0, 2) AS exact_value
    FROM pick p JOIN exact e ON e.q = p.q, bounds bo
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a mergeable equi-width histogram — the fourth
    sketch: 256 bucket counts are the whole state (merge = vector add,
    the partial-aggregate shape), and the p50/p95 estimates (bucket
    midpoint at the cumulative crossing) sit next to the exact
    interpolated percentiles computed alongside. Bounds come from a
    1-row broadcast min/max; every count is an exact integer so the
    oracle checks the ESTIMATES, not just shapes. The production form at
    100 TB when `approx_percentile`'s t-digest is overkill and
    cross-engine reproducibility matters."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("p"))
    # r14 negative (measured, reverted): folding the exact p50/p95 into
    # the bounds aggregate behind a 1-row checkpoint (orders scans 8→2)
    # LOST a 3-pair A/B 1.9-2.4 s vs 1.5-2.0 s — the cheap min/max agg
    # that unblocks the histogram got serialized behind the percentile
    # sort, while the old separate subtrees ran concurrently. Independent
    # corpus aggregates overlapping beats one combined pass here (§2.6).
    bounds = cents.agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
    withb = cents.crossJoin(F.broadcast(bounds)).select(
        "p", "lo", "hi",
        F.least(
            F.floor((F.col("p") - F.col("lo")) * float(_HB) / (F.col("hi") - F.col("lo") + 1)).cast("bigint"),
            F.lit(_HB - 1),
        ).alias("b"),
    )
    hist = withb.groupBy("b").agg(F.count("*").alias("c"))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "b", "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    qs = spark.createDataFrame([(0.5,), (0.95,)], "q double")
    pick = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("b").alias("bq"))
    )
    exact = cents.agg(
        F.percentile("p", F.lit(0.5)).alias("e50"),
        F.percentile("p", F.lit(0.95)).alias("e95"),
    )
    est = (
        pick.crossJoin(F.broadcast(bounds))
        .select(
            F.col("q").alias("quantile"),
            F.round(
                (F.col("lo") + (F.col("bq") + 0.5) * (F.col("hi") - F.col("lo") + 1) / float(_HB)) / 100.0,
                2,
            ).alias("est_value"),
        )
    )
    ex = exact.selectExpr(
        "stack(2, 0.5D, round(e50 / 100.0, 2), 0.95D, round(e95 / 100.0, 2))"
        " AS (quantile, exact_value)"
    )
    return est.join(ex, "quantile")


@query(
    "sketch_hll_hourly",
    oracle=f"""
    WITH hs AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ), rho AS (
      SELECT hour, h % {_HLL_M} AS bk,
             55 - len(list_filter(range(0, 54),
                                  p -> (1::BIGINT << p) <= (h // {_HLL_M}))) AS r
      FROM hs
    ), regs AS (
      SELECT hour, bk, MAX(r) AS mj FROM rho GROUP BY hour, bk
    ), per_g AS (
      SELECT hour, SUM(1::BIGINT << (55 - mj)) AS isum, COUNT(*) AS occ
      FROM regs GROUP BY hour
    ), filled AS (
      SELECT hour,
             CAST(isum + ({_HLL_M} - occ) * (1::BIGINT << 55) AS BIGINT) AS isum,
             {_HLL_M} - occ AS v
      FROM per_g
    ), est AS (
      SELECT hour, v, {_HLL_NUM!r} / CAST(isum AS DOUBLE) AS e_raw FROM filled
    ), exact AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(DISTINCT user_id) AS td
      FROM events GROUP BY 1
    )
    SELECT est.hour,
           ROUND(CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND v > 0
                      THEN {float(_HLL_M)!r} * LN({float(_HLL_M)!r} / v)
                      ELSE e_raw END, 4) AS est_distinct,
           CAST(exact.td AS INT) AS true_distinct
    FROM est JOIN exact ON exact.hour = est.hour
    """,
)
def sketch_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-HOUR HyperLogLog distinct users — the value-checked BATCH TWIN
    of the stateful streaming operator streaming/windows.py::
    hll_distinct_per_hour. Register max is batch-boundary-insensitive, so
    the streaming sketch carried across micro-batches lands on EXACTLY
    these numbers (tests/test_streaming_windows.py::
    test_streaming_hll_matches_batch_sketch proves the equality); this row
    puts the shared register math under the driver's DuckDB oracle,
    closing the streaming↔batch loop for the sketch family. Same m=64
    integer-exact register aggregation as sketch_hll_distinct, keyed by
    the event hour instead of the event type."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.select(
        F.date_trunc("hour", "ts").alias("hour"), "user_id"
    )
    est = sketches.hll_distinct(hourly, "hour", "user_id", m=_HLL_M)
    exact = hourly.groupBy("hour").agg(
        F.count_distinct("user_id").cast("int").alias("true_distinct")
    )
    return est.join(exact, "hour")


@query(
    "sketch_hll_sliding_24h",
    oracle=f"""
    WITH hs AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ), rho AS (
      SELECT hour, h % {_HLL_M} AS bk,
             55 - len(list_filter(range(0, 54),
                                  p -> (1::BIGINT << p) <= (h // {_HLL_M}))) AS r
      FROM hs
    ), hregs AS (
      SELECT hour, bk, MAX(r) AS mj FROM rho GROUP BY hour, bk
    ), hours AS (
      SELECT DISTINCT hour FROM hregs
    ), merged AS (
      SELECT t.hour, r.bk, MAX(r.mj) AS mj
      FROM hours t JOIN hregs r
        ON r.hour <= t.hour AND r.hour > t.hour - INTERVAL 24 HOURS
      GROUP BY t.hour, r.bk
    ), per_g AS (
      SELECT hour, SUM(1::BIGINT << (55 - mj)) AS isum, COUNT(*) AS occ
      FROM merged GROUP BY hour
    ), filled AS (
      SELECT hour,
             CAST(isum + ({_HLL_M} - occ) * (1::BIGINT << 55) AS BIGINT) AS isum,
             {_HLL_M} - occ AS v
      FROM per_g
    ), est AS (
      SELECT hour, v, {_HLL_NUM!r} / CAST(isum AS DOUBLE) AS e_raw FROM filled
    ), exact AS (
      SELECT t.hour, COUNT(DISTINCT e.user_id) AS td
      FROM hours t JOIN events e
        ON date_trunc('hour', e.ts) <= t.hour
       AND date_trunc('hour', e.ts) > t.hour - INTERVAL 24 HOURS
      GROUP BY t.hour
    )
    SELECT est.hour,
           ROUND(CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND v > 0
                      THEN {float(_HLL_M)!r} * LN({float(_HLL_M)!r} / v)
                      ELSE e_raw END, 4) AS est_distinct,
           CAST(exact.td AS INT) AS true_distinct
    FROM est JOIN exact ON exact.hour = est.hour
    """,
)
def sketch_hll_sliding_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour distinct users ending at every hour, computed by
    MERGING the per-hour HLL register sets (groupBy(bucket).max over the
    24 contributing hours) — the operation that makes sketches the scale
    answer for sliding distinct counts: the exact form re-scans 24 hours
    of RAW events per output hour (24x read amplification, or a giant
    distinct state), while the sketch form joins 24 rows of m=64-byte
    state per output hour, a constant regardless of event volume. Uses
    operators/sketches.py::hll_registers / hll_estimate_from_registers —
    the same register math as sketch_hll_hourly, so the value oracle
    covers the MERGE itself; the exact count computed alongside shows
    the estimate's error in-row."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.select(F.date_trunc("hour", "ts").alias("hour"), "user_id")
    # r14 (guide §2.3/§2.4, the sliding-p95 restructure applied to the
    # distinct twin): the r13 exact side fanned every distinct (hour,
    # user) pair ×24 into a count_distinct — a ~2.4M-record exchange at
    # sf0.1. One corpus shuffle now builds per-hour DISTINCT USER SETS;
    # the HLL registers derive from the exploded sets (register max over
    # duplicates is the max over distinct values, so the sketch is
    # bit-identical), and the exact trailing distinct is the size of the
    # deduplicated union of 24 set rows. Per-group memory stays O(window
    # distinct) — the same as the count_distinct state it replaces.
    perhour = (
        hourly.groupBy("hour")
        .agg(F.collect_set("user_id").alias("us"))
        .localCheckpoint(eager=False)
    )
    vals = perhour.select("hour", F.explode("us").alias("user_id"))
    regs = sketches.hll_registers(vals, "hour", "user_id", m=_HLL_M)
    hours = perhour.select(F.col("hour").alias("t"))
    # equi-shape window fan-out: each register row contributes to the 24
    # target hours [h, h+23]; a range join here would be a nested loop,
    # the explode keeps everything an equi-join/agg (×24 on SKETCH rows —
    # 64 per hour — not on events)
    offsets = F.explode(F.sequence(F.lit(0), F.lit(23))).alias("off")
    fanned = regs.select("g", "bk", "mj", offsets).select(
        (F.col("g") + F.expr("make_interval(0, 0, 0, 0, off, 0, 0)")).alias("t"),
        "bk",
        "mj",
    )
    merged = (
        fanned.join(hours, "t", "left_semi")
        .groupBy("t", "bk")
        .agg(F.max("mj").alias("mj"))
        .withColumnRenamed("t", "g")
    )
    est = sketches.hll_estimate_from_registers(merged, m=_HLL_M)
    sets_f = perhour.select("hour", "us", offsets).select(
        (F.col("hour") + F.expr("make_interval(0, 0, 0, 0, off, 0, 0)")).alias(
            "t"
        ),
        "us",
    )
    exact = (
        sets_f.join(hours, "t", "left_semi")
        .groupBy("t")
        .agg(
            F.size(F.array_distinct(F.flatten(F.collect_list("us"))))
            .cast("int")
            .alias("true_distinct")
        )
    )
    return (
        est.withColumnRenamed("g", "hour")
        .join(exact.withColumnRenamed("t", "hour"), "hour")
    )


@query(
    "sketch_histogram_sliding_p95",
    oracle=f"""
    WITH cents AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS p
      FROM events
    ), bounds AS (
      SELECT MIN(p) AS lo, MAX(p) AS hi FROM cents
    ), hist AS (
      SELECT hour,
             LEAST(CAST(FLOOR((p - lo) * {_HB}.0 / (hi - lo + 1)) AS BIGINT),
                   {_HB - 1}) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM cents, bounds GROUP BY 1, 2
    ), hours AS (
      SELECT DISTINCT hour FROM hist
    ), merged AS (
      SELECT t.hour, h.b, SUM(h.c) AS c
      FROM hours t JOIN hist h
        ON h.hour <= t.hour AND h.hour > t.hour - INTERVAL 24 HOURS
      GROUP BY t.hour, h.b
    ), cum AS (
      SELECT hour, b, c,
             SUM(c) OVER (PARTITION BY hour ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER (PARTITION BY hour) AS n
      FROM merged
    ), pick AS (
      SELECT hour, MIN(b) FILTER (WHERE cum >= 0.95 * n) AS bq,
             MAX(n) AS n
      FROM cum GROUP BY hour
    ), exact AS (
      SELECT t.hour, quantile_cont(e.p, 0.95) AS ev
      FROM hours t JOIN cents e
        ON e.hour <= t.hour AND e.hour > t.hour - INTERVAL 24 HOURS
      GROUP BY t.hour
    )
    SELECT p.hour,
           CAST(p.n AS BIGINT) AS n_events,
           ROUND((bo.lo + (p.bq + 0.5) * (bo.hi - bo.lo + 1) / {_HB}.0) / 100.0, 2)
             AS est_p95,
           CAST(ROUND(e.ev * 100, 0) AS BIGINT) AS exact_p95_c100
    FROM pick p JOIN exact e ON e.hour = p.hour, bounds bo
    """,
)
def sketch_histogram_sliding_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour p95 event value ending at every hour — the
    QUANTILE companion of sketch_hll_sliding_24h, closing the pattern:
    any mergeable sketch (register max for distincts, bucket-count
    vector add here) turns a sliding-window statistic from a 24×
    raw-data re-scan into a join of per-period sketch rows (256 counts
    per hour, constant in event volume). Global bucket bounds come from
    one broadcast min/max so every hour's histogram is merge-compatible;
    the same explode-to-target-hours equi fan-out as the HLL twin — the
    only nested-loop nodes are the unconditioned 1-row bounds broadcasts
    (plan test pins that every NLJ in this plan is a Cross of a 1-row
    side, so a range-join regression fails loudly); estimates land next to the
    exact trailing percentile so the error is visible in-row, and every
    count is an exact integer so the oracle checks the ESTIMATES."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    # r14 restructure (guide §2.3/§2.4, VERDICT r13 item 4): the r13 form
    # fanned every RAW (hour, p) row ×24 into the exact-percentile
    # aggregate — a 2.4M-record exchange at sf0.1 whose per-record shuffle
    # overhead dominated the query (isolated 2.89 s). The corpus is now
    # shuffled ONCE, into per-hour SORTED value arrays; the histogram,
    # the global bounds, the hour grid and the exact trailing percentile
    # all derive from that hour-count-sized table, so the ×24 sliding fan
    # replicates 720 array rows instead of 100k value rows and the
    # trailing p95 is an explicit interpolation over the flattened,
    # re-sorted window array. Interpolation math is Spark's/DuckDB's
    # quantile_cont formula over the identical integers, so the rounded
    # hundredths column is unchanged (same k/20-fraction exactness
    # argument as before). Per-group memory is O(window rows) — identical
    # to the percentile() aggregate state it replaces; the histogram side
    # remains the scale path.
    perhour = (
        e.select(
            F.date_trunc("hour", "ts").alias("hour"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("p"),
        )
        .groupBy("hour")
        .agg(
            F.sort_array(F.collect_list("p")).alias("ps"),
            F.count("*").alias("nh"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = perhour.agg(
        F.min(F.element_at("ps", 1)).alias("lo"),
        F.max(F.element_at("ps", F.size("ps"))).alias("hi"),
    )
    hist = (
        perhour.select("hour", F.explode("ps").alias("p"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "hour",
            F.least(
                F.floor(
                    (F.col("p") - F.col("lo")) * float(_HB)
                    / (F.col("hi") - F.col("lo") + 1)
                ).cast("bigint"),
                F.lit(_HB - 1),
            ).alias("b"),
        )
        .groupBy("hour", "b")
        .agg(F.count("*").alias("c"))
    )
    hours = perhour.select(F.col("hour").alias("t"))
    offsets = F.explode(F.sequence(F.lit(0), F.lit(23))).alias("off")
    fanned = hist.select("hour", "b", "c", offsets).select(
        (F.col("hour") + F.expr("make_interval(0, 0, 0, 0, off, 0, 0)")).alias("t"),
        "b",
        "c",
    )
    merged = (
        fanned.join(hours, "t", "left_semi")
        .groupBy("t", "b")
        .agg(F.sum("c").alias("c"))
    )
    w = Window.partitionBy("t").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.select(
        "t", "b", "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("t")).alias("n"),
    )
    pick = (
        cum.filter(F.col("cum") >= 0.95 * F.col("n"))
        .groupBy("t")
        .agg(F.min("b").alias("bq"), F.max("n").alias("n"))
    )
    fanned_ps = perhour.select("hour", "ps", offsets).select(
        (F.col("hour") + F.expr("make_interval(0, 0, 0, 0, off, 0, 0)")).alias("t"),
        "ps",
    )
    win = (
        fanned_ps.join(hours, "t", "left_semi")
        .groupBy("t")
        .agg(F.sort_array(F.flatten(F.collect_list("ps"))).alias("vs"))
        .select("t", "vs", F.size("vs").cast("bigint").alias("nw"))
    )
    # quantile_cont interpolation: rank = 0.95·(n−1) (0-based), result =
    # v[lo] + (v[hi] − v[lo])·frac — the same double arithmetic Spark's
    # percentile() and DuckDB's quantile_cont perform over these integers
    rank = F.lit(0.95) * (F.col("nw") - 1).cast("double")
    lo_i = F.floor(rank).cast("int")
    frac = rank - F.floor(rank)
    v_lo = F.element_at("vs", lo_i + 1).cast("double")
    v_hi = F.element_at(
        "vs", F.least(lo_i + 2, F.col("nw").cast("int"))
    ).cast("double")
    exact = win.select(
        "t", (v_lo + (v_hi - v_lo) * frac).alias("ev")
    )
    return (
        pick.join(exact, "t")
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col("t").alias("hour"),
            F.col("n").cast("bigint").alias("n_events"),
            F.round(
                (F.col("lo") + (F.col("bq") + 0.5) * (F.col("hi") - F.col("lo") + 1) / float(_HB)) / 100.0,
                2,
            ).alias("est_p95"),
            # integer hundredths-of-cents: the interpolated p95 over
            # integer cents has fraction k/20, so x100 is an exact integer
            # and rounding to it is 1ulp-stable cross-engine (a /100 +
            # round(2) lands on half-cent boundaries and diverges)
            F.round(F.col("ev") * 100, 0).cast("bigint").alias("exact_p95_c100"),
        )
    )


_ABS_W = 8192
_ABSENT = ["qqabsentalpha", "qqabsentbeta", "qqabsentgamma"]


def _cm_pos_sql_abs(expr: str, i: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({expr} || '#{i}'), 1, 15)) AS BIGINT) % {_ABS_W}"
    )


@query(
    "sketch_countmin_absent_probe",
    oracle=f"""
    WITH toks AS (
      SELECT t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), truec AS (
      SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY tok
    ), cells AS (
      SELECT i.i AS rw, CASE i.i
               WHEN 0 THEN {{p0}}
               WHEN 1 THEN {{p1}}
               ELSE {{p2}} END AS cl,
             COUNT(*) AS c
      FROM toks, UNNEST(range(0, {_DEPTH})) AS i(i)
      GROUP BY 1, 2
    ), top AS (
      SELECT tok FROM truec ORDER BY true_count DESC, tok LIMIT 3
    ), probes AS (
      SELECT tok FROM top
      UNION ALL
      SELECT a.tok FROM (VALUES {{absent_rows}}) AS a(tok)
    ), pcells AS (
      SELECT tok, i.i AS rw, CASE i.i
               WHEN 0 THEN {{p0}}
               WHEN 1 THEN {{p1}}
               ELSE {{p2}} END AS cl
      FROM probes, UNNEST(range(0, {_DEPTH})) AS i(i)
    )
    SELECT p.tok,
           CAST(COALESCE(MAX(t.true_count), 0) AS BIGINT) AS true_count,
           CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est_count
    FROM pcells p
    LEFT JOIN cells c ON c.rw = p.rw AND c.cl = p.cl
    LEFT JOIN truec t ON t.tok = p.tok
    GROUP BY p.tok
    """.format(
        p0=_cm_pos_sql_abs("tok", 0),
        p1=_cm_pos_sql_abs("tok", 1),
        p2=_cm_pos_sql_abs("tok", 2),
        absent_rows=", ".join(f"('{t}')" for t in _ABSENT),
    ),
)
def sketch_countmin_absent_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min probed at tokens that were NEVER inserted (plus the top-3
    present tokens as contrast): (tok, true_count, est_count). Pins the
    round-4 advisor fix (operators/sketches.py::countmin_estimate): the
    sketch table materializes only non-zero cells, so the probe join must
    be a LEFT join with absent cells coalesced to 0 — under the old inner
    join an absent probe either vanished or took min() over only its
    occupied cells. Width 8192 leaves most cells empty at driver SF, so
    each absent probe deterministically hits an empty cell and reports
    est_count 0; the oracle implements the same all-d-cells min."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
    # r14: same one-tokenize restructure as sketch_countmin_tokens — the
    # type-count table is cut once and the sketch derives from it
    # weighted (identical cell integers)
    truec = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .localCheckpoint(eager=False)
    )
    top = truec.orderBy(F.desc("true_count"), "tok").limit(3).select("tok")
    absent = spark.createDataFrame([(t,) for t in _ABSENT], "tok string")
    probes = top.unionByName(absent)
    est = sketches.countmin_estimate(
        truec, "tok", probes, "tok",
        depth=_DEPTH, width=_ABS_W, weight_col="true_count",
    )
    return (
        est.join(truec, est.probe == truec.tok, "left")
        .select(
            F.col("probe").alias("tok"),
            F.coalesce(F.col("true_count"), F.lit(0)).cast("bigint").alias("true_count"),
            F.col("est_count").cast("bigint").alias("est_count"),
        )
    )


@query(
    "sketch_misra_gries_topk",
    oracle=f"""
    WITH toks AS (
      SELECT t.tok FROM (
        SELECT string_split_regex(trim(lower(text)), '\\s+') AS ts
        FROM documents
      ), UNNEST(ts) AS t(tok)
    ), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY tok, n
    HAVING COUNT(*) > n / {_K}
    ORDER BY cnt DESC, tok
    """,
)
def sketch_misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (token freq > n/64) via the two-pass
    Misra–Gries prefilter (operators/sketches.py::heavy_hitters_exact):
    per-partition MG summaries → ≤ k·P candidates with provably zero
    false negatives → broadcast semi-join exact recount. The sketch
    bounds the WORK (the shuffled agg never sees the full vocabulary);
    the ANSWER is exact, so the oracle hash-matches it."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
    hh = sketches.heavy_hitters_exact(toks, "tok", k=_K)
    return hh.select("tok", F.col("cnt").cast("bigint").alias("cnt")).orderBy(
        F.desc("cnt"), F.asc("tok")
    )


@query(
    "sketch_kmv_setops",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT event_type AS g, user_id AS key FROM events
    ), hs AS (
      SELECT g,
             (CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
               / {_HS!r} AS h
      FROM pairs
    ), ranked AS (
      SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r FROM hs
    ), sk AS (
      SELECT g, h FROM ranked WHERE r <= {_K}
    ), combos AS (
      SELECT a.g AS g_a, b.g AS g_b
      FROM (SELECT DISTINCT g FROM sk) a
      JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g
    ), u AS (
      SELECT DISTINCT c.g_a, c.g_b, s.h
      FROM combos c JOIN sk s ON s.g = c.g_a OR s.g = c.g_b
    ), ur AS (
      SELECT g_a, g_b, h,
             ROW_NUMBER() OVER (PARTITION BY g_a, g_b ORDER BY h) AS r
      FROM u
    ), uk AS (
      SELECT g_a, g_b, h FROM ur WHERE r <= {_K}
    ), ustats AS (
      SELECT g_a, g_b, MAX(h) AS hk, COUNT(*) AS n
      FROM uk GROUP BY 1, 2
    ), rho AS (
      SELECT k.g_a, k.g_b, COUNT(*) AS rho
      FROM uk k
      WHERE EXISTS (SELECT 1 FROM sk a WHERE a.g = k.g_a AND a.h = k.h)
        AND EXISTS (SELECT 1 FROM sk b WHERE b.g = k.g_b AND b.h = k.h)
      GROUP BY 1, 2
    )
    SELECT u.g_a, u.g_b,
           ROUND(CASE WHEN u.n < {_K} THEN CAST(u.n AS DOUBLE)
                      ELSE ({_K} - 1) / u.hk END, 4) AS est_union,
           ROUND(COALESCE(r.rho, 0) / CAST(u.n AS DOUBLE), 4) AS est_jaccard,
           ROUND(COALESCE(r.rho, 0) / CAST(u.n AS DOUBLE)
                 * CASE WHEN u.n < {_K} THEN CAST(u.n AS DOUBLE)
                        ELSE ({_K} - 1) / u.hk END, 4) AS est_intersect
    FROM ustats u LEFT JOIN rho r ON r.g_a = u.g_a AND r.g_b = u.g_b
    """,
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set operations between every event-type pair's
    user sets, computed purely from k-row KMV sketches
    (operators/sketches.py::kmv_set_ops): union / Jaccard / intersection
    estimates of two 10-digit-cardinality sets from 2·k hashes. The only
    corpus pass is the distinct+hash build; the oracle reproduces every
    estimate bit-for-bit from the portable hash."""
    ev = load_table(spark, sf_dir, "events")
    return sketches.kmv_set_ops(ev, "event_type", "user_id", k=_K)


@query(
    "sketch_bloom_fpr_audit",
    oracle="""
    WITH build AS (
      SELECT DISTINCT w AS word
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ),
    probe AS (
      -- synthetic non-members: the corpus vocabulary is plain words, so
      -- 'zz#<i>' strings are true negatives by construction
      SELECT 'zz#' || i.i AS word FROM UNNEST(range(0, 2000)) AS i(i)
    ),
    bits AS (
      SELECT DISTINCT
        CAST(('0x' || substr(md5(word || '#' || i.i), 1, 15)) AS BIGINT)
          % 16384 AS pos
      FROM build, UNNEST(range(0, 3)) AS i(i)
    ),
    hits AS (
      SELECT p.word
      FROM probe p
      WHERE NOT EXISTS (
        SELECT 1 FROM UNNEST(range(0, 3)) AS i(i)
        WHERE CAST(('0x' || substr(md5(p.word || '#' || i.i), 1, 15))
                   AS BIGINT) % 16384
              NOT IN (SELECT pos FROM bits)
      )
    ),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probe,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_false_pos
    )
    SELECT n_build, n_probe, n_bits_set, n_false_pos,
           ROUND(CAST(n_false_pos AS DOUBLE) / n_probe, 6) AS measured_fpr,
           ROUND(POWER(CAST(n_bits_set AS DOUBLE) / 16384, 3), 6)
             AS occupancy_fpr
    FROM s
    """,
)
def sketch_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs predicted Bloom-filter false-positive rate — the audit
    that tells a decontamination pipeline whether its m/k sizing
    (pipeline_decontaminate_bloom uses the same k=3 portable-hash probe
    shape) actually delivers the designed FPR before trusting the
    prefilter at 100 TB. Build the m=2^14 filter over the corpus word
    set, probe with 2,000 synthetic strings outside the vocabulary (true
    negatives by construction), and compare the measured FP fraction to
    the exact occupancy prediction (set_bits/m)^k. Because the hash is
    md5-portable, the ORACLE reconstructs the identical bit set and the
    identical per-probe membership — the FP COUNT itself is value-checked,
    not just the rate. All joins are word-domain-sized (vocabulary), and
    membership is a semi/anti-join against the distinct-positions table —
    the m-bounded relational form of the bitmask."""
    from ..functions.hashing import portable_hash64

    m_bits, k = 16384, 3
    d = load_table(spark, sf_dir, "documents")
    # r14: build fed the bit table AND its own count, and bits fed the
    # membership join AND its count — the corpus word-distinct ran 3×.
    # Both tables are vocabulary-/m-bounded; materialize each once (§2.4).
    build = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    ).localCheckpoint(eager=False)
    # synthetic non-members: the corpus vocabulary is plain words, so
    # 'zz#<i>' strings are true negatives by construction
    probe = spark.range(2000).select(
        F.concat(F.lit("zz#"), F.col("id")).alias("word")
    )

    def positions(col):
        return [
            F.pmod(
                portable_hash64(F.concat(col, F.lit(f"#{i}"))), F.lit(m_bits)
            )
            for i in range(k)
        ]

    bits = (
        build.select(
            F.explode(F.array(*positions(F.col("word")))).alias("pos")
        ).distinct()
    ).localCheckpoint(eager=False)
    probe_pos = probe.select(
        "word", F.posexplode(F.array(*positions(F.col("word"))))
    ).select("word", F.col("col").alias("pos"))
    # a probe word is a false positive iff NONE of its k positions is
    # missing from the bit set: anti-join to find missing positions,
    # then anti-join the words that had any
    missing = probe_pos.join(bits, "pos", "left_anti").select("word").distinct()
    false_pos = probe.join(missing, "word", "left_anti")
    counts = (
        build.agg(F.count("*").cast("bigint").alias("n_build"))
        .crossJoin(probe.agg(F.count("*").cast("bigint").alias("n_probe")))
        .crossJoin(bits.agg(F.count("*").cast("bigint").alias("n_bits_set")))
        .crossJoin(
            false_pos.agg(F.count("*").cast("bigint").alias("n_false_pos"))
        )
    )
    return counts.select(
        "n_build",
        "n_probe",
        "n_bits_set",
        "n_false_pos",
        F.round(
            F.col("n_false_pos").cast("double") / F.col("n_probe"), 6
        ).alias("measured_fpr"),
        F.round(
            F.pow(F.col("n_bits_set").cast("double") / m_bits, F.lit(3)), 6
        ).alias("occupancy_fpr"),
    )
