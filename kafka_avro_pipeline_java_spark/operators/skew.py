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
