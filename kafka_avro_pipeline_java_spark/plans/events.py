"""Event-stream analytics over the ``events`` table (batch forms of the
streaming patterns in streaming/ — tumbling windows, sessionization, lag,
as-of join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.asof import asof_join
from ..sources import load_table
from .registry import query


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(ROUND(value * 1000000, 0)) / 1000000.0, 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.round(F.col("value") * 1000000, 0)) / 1000000.0, 2).alias("total_value"),
    )


@query(
    "events_tumbling_window_fn",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch_us(ts) / 1800000000) * 1800000000 AS BIGINT))
             AS window_start,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def events_tumbling_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming ``window()`` function exercised in batch mode (same
    epoch-aligned bucketing the streaming tumbling aggregation uses);
    oracle reproduces the bucket arithmetic on epoch microseconds."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


@query(
    "events_session_window_fn",
    oracle="""
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM x
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-native ``session_window()`` operator exercised in batch
    mode (the same merge logic Structured Streaming runs stateful — windows
    are [first_ts, last_ts + gap), an event at exactly the previous window's
    end starts a new session). Oracle reproduces the merge as gaps-and-
    islands with the matching >= gap boundary. Streaming parity of this
    operator across restarts is tested in tests/ (streaming/windows.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_sliding_window_fn",
    oracle="""
    SELECT make_timestamp(CAST((floor(epoch_us(ts) / 600000000) - k.k) * 600000000 AS BIGINT))
             AS window_start,
           COUNT(*) AS n_events
    FROM events, UNNEST(range(0, 3)) AS k(k)
    GROUP BY 1
    """,
)
def events_sliding_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — ``window(ts, 30min, slide 10min)`` in
    batch mode: every event lands in exactly window/slide = 3 overlapping
    windows. The oracle expands each event into its 3 slide-aligned window
    starts and aggregates; Spark's streaming window assignment uses the same
    epoch-aligned arithmetic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


@query(
    "events_dedup_watermark_eq",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_dedup_watermark_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of streaming ``dropDuplicatesWithinWatermark`` on
    (user_id, event_type): keep each key's FIRST event in event-time order
    (tie-broken by event_id so the survivor is deterministic — batch
    ``dropDuplicates`` alone keeps an arbitrary row). The streaming path
    (state + watermark eviction, late-duplicate drop across restart) is
    tested in tests/; this oracle row pins the keep-first semantics the
    stream converges to."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


@query(
    "sort_nulls_first",
    oracle="""
    SELECT c.c_custkey, b.n_big
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_big FROM orders
      WHERE o_totalprice > 300000 GROUP BY o_custkey
    ) b ON b.o_custkey = c.c_custkey
    ORDER BY b.n_big ASC NULLS FIRST, c.c_custkey
    LIMIT 50
    """,
)
def sort_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-ordering coverage: engines disagree on default null
    placement (Spark NULLS FIRST asc, DuckDB NULLS LAST), so the ordering
    is pinned explicitly on both sides."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .select("c_custkey", "n_big")
        .orderBy(F.col("n_big").asc_nulls_first(), F.col("c_custkey").asc())
        .limit(50)
    )


@query(
    "events_lag_per_user",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def events_lag_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a >30-min silence starts a new session.
    Streaming equivalent: ``session_window(ts, '30 minutes')`` (streaming/)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "events_asof_last_click",
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), clk AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ), j AS (
      SELECT e.event_id, c.value,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM err e JOIN clk c ON c.user_id = e.user_id AND c.ts <= e.ts
    )
    SELECT e.event_id, e.user_id, j.value AS last_click_value
    FROM err e LEFT JOIN (SELECT event_id, value FROM j WHERE rn = 1) j
      ON j.event_id = e.event_id
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the value of the same user's most
    recent click at-or-before it. Uses the union+window asof operator
    (single shuffle — no per-key cross product; see operators/asof.py)."""
    e = load_table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("last_click_value")
    )
    joined = asof_join(
        err, clk, on="user_id", ts="ts", value_cols=["last_click_value"], tiebreak="event_id"
    )
    return joined.select("event_id", "user_id", "last_click_value")


@query(
    "events_funnel",
    oracle="""
    WITH u1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), u2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'click' AND e.ts > u1.t1
        AND e.ts <= u1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ), u3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > u2.t2
        AND e.ts <= u2.t2 + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM u1) AS n_view,
           (SELECT COUNT(*) FROM u2) AS n_view_click,
           (SELECT COUNT(*) FROM u3) AS n_full_funnel
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel (view -> click -> purchase, strictly
    ordered first occurrences, each stage within 7 days of the previous —
    the conversion-window constraint that makes the stages discriminate).
    The oracle re-derives each stage with a per-stage join+min; the Spark
    plan instead computes all three stage timestamps in ONE pass over a
    single hash partitioning of user_id — three stacked window-mins over
    the same Window spec share one Exchange, so at 100 TB the funnel
    costs one shuffle of (user_id, ts, event_type), not three join
    shuffles."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    horizon = F.expr("INTERVAL 7 DAY")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + horizon),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + horizon),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )
