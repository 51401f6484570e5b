"""Stream-stream and stream-static joins with watermark-bounded state.

Absent from the reference (its only "join" is the 1:1 topic→table mapping,
SURVEY.md §2B) — these complete the streaming relational surface:

- stream-stream inner join within a time bound: both sides buffer in the
  state store only up to watermark + bound (state size is O(rate × bound),
  independent of stream length);
- stream-static broadcast enrichment: dimension lookup with zero state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join: right events within ``(left_ts, left_ts + within]`` for
    the same key. Both sides are watermarked so the state store evicts
    rows older than the horizon — the condition's time bound is what lets
    Spark compute that horizon."""
    l = left.withWatermark(left_ts, watermark).select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lk, rk = f"{left_prefix}{key}", f"{right_prefix}{key}"
    lt, rt = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def stream_stream_left_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left-outer variant: unmatched left rows emit with nulls once the
    watermark passes their join horizon (so 'no match' is only declared
    when no match can still arrive). Same bounded state as the inner form."""
    l = left.withWatermark(left_ts, watermark).select(
        [F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, watermark).select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    lk, rk = f"{left_prefix}{key}", f"{right_prefix}{key}"
    lt, rt = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "left_outer")


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream enriched by a static dimension: broadcast hash join per
    micro-batch, no streaming state at all."""
    return stream.join(F.broadcast(dim), on, "left")
