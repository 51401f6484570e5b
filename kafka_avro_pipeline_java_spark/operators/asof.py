"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (SURVEY.md §2B "custom
operators" rule): union both sides into one keyed stream, sort within key,
and carry the most recent right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Scale: one shuffle on the key (same as any keyed window), no Python, no
cross product — this survives 100 TB where the naive
``left.join(right, right.ts <= left.ts)`` + argmax explodes quadratically
per key. At equal timestamps the right row sorts BEFORE the left row, i.e.
"at or before" semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the latest right-side ``value_cols`` with
    ``right[ts] <= left[ts]`` for the same ``on`` key.

    ``tiebreak``: optional unique column (on both sides) ordering rows with
    equal timestamps deterministically.
    ``tolerance``: optional maximum staleness (e.g. ``F.expr("INTERVAL 10
    MINUTES")`` for timestamps, or a number for numeric ``ts``): matches
    older than ``left[ts] - tolerance`` are nulled out — pandas
    ``merge_asof(tolerance=...)`` semantics, still one shuffle.
    """
    for side, df, needed in (("left", left, [on, ts]),
                             ("right", right, [on, ts, *value_cols])):
        missing = [c for c in needed if c not in df.columns]
        if missing:
            raise ValueError(f"asof_join: {side} side is missing columns {missing}")
    if tiebreak is not None and (tiebreak not in left.columns or tiebreak not in right.columns):
        raise ValueError(f"asof_join: tiebreak column {tiebreak!r} must exist on both sides")

    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        on, ts, *(tiebreak and [tiebreak] or []), *value_cols
    ).withColumn("__side", F.lit(0))
    # align schemas for unionByName
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    for c in value_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None))
    merged = l.unionByName(r.select(*l.columns))

    # right rows (side 0) sort before left rows at equal ts → "at or before";
    # tiebreak orders right rows among themselves so `last()` is deterministic
    order = [F.col(ts).asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried_cols = [
        F.last(F.when(F.col("__side") == 0, F.col(v)), ignorenulls=True).over(w).alias(v)
        for v in value_cols
    ]
    # the matched right row's ts, carried alongside for tolerance checks
    match_ts = F.last(
        F.when(F.col("__side") == 0, F.col(ts)), ignorenulls=True
    ).over(w).alias("__match_ts")
    carried = merged.select(
        *[c for c in merged.columns if c not in value_cols], match_ts, *carried_cols
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        stale = F.col("__match_ts") < (F.col(ts) - tolerance)
        out = out.select(
            *[c for c in out.columns if c not in value_cols and c != "__match_ts"],
            *[F.when(stale, F.lit(None)).otherwise(F.col(v)).alias(v) for v in value_cols],
        )
        return out
    return out.drop("__match_ts")
