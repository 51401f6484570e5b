"""Skew-mitigation utilities for joins on hot keys.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime by splitting oversized shuffle partitions. ``salted_join`` is
the explicit fallback for the pathological case AQE can't fix: a single
join KEY so hot that one task would still own it after splitting — the
fact-side key is sharded into ``n_salts`` synthetic keys and the dim side
is replicated ``n_salts``× (explode of a literal range, cheap for any
realistically-sized dimension), so the hot key's rows spread over
``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted.

    Result columns = fact columns + dim columns (minus the duplicate key),
    same as a plain ``fact.join(dim, on)``.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    *,
    n_salts: int = 64,
    alias: str = "n_distinct",
) -> DataFrame:
    """EXACT count-distinct per group with the hot-group reduce spread over
    ``n_salts`` tasks. The salt is derived from the DISTINCT column's hash,
    so every distinct value lands in exactly one (group, salt) cell —
    partial distinct counts are disjoint and their SUM is the exact answer,
    not an approximation.

    Catalyst's own count-distinct rewrite (Expand + two-phase aggregate)
    covers the common case; this explicit form is the 100 TB escape hatch
    for a SINGLE pathologically hot group: phase 1 reduces
    (group, salt, value) with map-side combine, phase 2 sums ``n_salts``
    small rows per group — the hot group's reduce work is parallelized
    ``n_salts``-way instead of landing on one task.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.countDistinct(distinct_col).alias("__pd")
    )
    return partial.groupBy(*keys).agg(F.sum("__pd").cast("long").alias(alias))
