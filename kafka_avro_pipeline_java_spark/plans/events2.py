"""Time-series operators over ``events``: gap-filled resampling with
last-observation-carried-forward, and trailing-window anomaly scores.

The timescale/hypertable-style surface: regularize an irregular event
stream onto a fixed grid, then score each bucket against its own trailing
history — both as pure window/aggregate plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# Exact hourly mean: integer-microsecond sum (engine-order-independent)
# divided by count — the same trick events_hourly_rollup uses.
_EXACT_MEAN_SQL = "ROUND(SUM(ROUND(value * 1000000, 0)) / 1000000.0 / COUNT(value), 4)"


@query(
    "events_resample_locf",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS INT) AS n_events,
             {_EXACT_MEAN_SQL} AS mean_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
    ), grid AS (
      SELECT user_id, g.g AS hour
      FROM bounds, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g(g)
    )
    SELECT g.user_id, g.hour,
           COALESCE(h.n_events, 0) AS n_events,
           LAST_VALUE(h.mean_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    """,
)
def events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's event stream onto an hourly grid between
    their first and last active hour; empty buckets carry the last
    observed hourly mean forward (LOCF interpolation).

    Plan: one keyed hourly aggregate, a per-user bounds aggregate whose
    ``sequence()`` explodes the grid (rows ∝ users × active span — never a
    cross join against a global calendar), a keyed left join back, and ONE
    window pass for the carry-forward. Everything partitions by user; at
    100 TB the grid explode is the only row amplification and it is
    bounded by the span actually observed per user."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").cast("int").alias("n_events"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000, 0)) / 1000000.0 / F.count("value"),
            4,
        ).alias("mean_value"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("mean_value", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@query(
    "events_hourly_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), scored AS (
      SELECT event_type, hour, n,
             AVG(n) OVER w AS mu,
             STDDEV_SAMP(n) OVER w AS sigma,
             COUNT(*) OVER w AS n_hist
      FROM hourly
      WINDOW w AS (
        PARTITION BY event_type ORDER BY epoch(hour)
        RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING
      )
    )
    SELECT event_type, hour, CAST(n AS INT) AS n_events,
           ROUND((n - mu) / sigma, 4) AS zscore,
           CASE WHEN ABS((n - mu) / sigma) >= 2 THEN 1 ELSE 0 END AS is_anomaly
    FROM scored
    WHERE n_hist >= 12 AND sigma > 0
    """,
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each (event_type, hour) bucket's
    count is z-scored against that type's own previous 24 hours (RANGE
    frame on epoch seconds, so calendar gaps don't silently shrink the
    baseline the way a ROWS frame would). Buckets need >= 12 trailing
    hours of history and nonzero variance to be scored.

    Plan: one keyed hourly aggregate, ONE window shuffle on event_type —
    the whole detector is two exchanges regardless of corpus size."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").cast("double").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("hour"))
        .rangeBetween(-86400, -3600)
    )
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w)
    return (
        hourly.select(
            "event_type",
            "hour",
            F.col("n").cast("int").alias("n_events"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) >= 2).cast("int").alias("is_anomaly"),
            F.count("n").over(w).alias("__n_hist"),
            F.stddev_samp("n").over(w).alias("__sigma"),
        )
        .filter((F.col("__n_hist") >= 12) & (F.col("__sigma") > 0))
        .drop("__n_hist", "__sigma")
    )
