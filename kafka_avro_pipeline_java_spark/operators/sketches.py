"""Deterministic sketch aggregates: KMV distinct-count and Count-Min.

Approximate aggregates are the bread of petabyte OLAP — but "approximate"
does not have to mean "unverifiable". Built on the md5-portable hash
(functions/hashing.py::portable_hash64), every sketch here is a PURE
FUNCTION of its input set: the k-minimum-values estimator and the
Count-Min cells come out bit-identical on any engine, so the DuckDB
oracle checks the ESTIMATES value-for-value, not just row counts. (The
built-in `approx_count_distinct`/HLL++ stays registered rows-only —
`approx_distinct_customers` — because ITS hash is engine-private; these
are the engine-portable counterparts.)

100 TB shapes:
- KMV: one distinct-style shuffle on (group, key-hash), then a per-group
  window keeping ranks ≤ k — the sketch state per group is k 8-byte
  hashes, merged associatively (union → k smallest), which is why KMV
  scales as a partial aggregate. Estimate: (k−1) / h_(k) with h in (0,1].
- Count-Min: d hashed cells per item → a (d × m)-cell count table via one
  word-count-shaped agg (map-side combined). Point queries probe d cells
  and take the min; overestimates only, ε ≈ e/m with prob 1−e^{−d}.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

# portable_hash64 yields 60-bit non-negative ints; normalize into (0, 1]
_HASH_SPACE = float(1 << 60)


def _unit_hash(col: Column) -> Column:
    return (portable_hash64(col) + 1) / F.lit(_HASH_SPACE)


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, *, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, est_distinct).
    Exact when a group has < k distinct keys (the sketch IS the set);
    otherwise (k−1)/h_(k)."""
    from pyspark.sql.window import Window

    pairs = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("key"))
        .distinct()
        .select("g", _unit_hash(F.col("key").cast("string")).alias("h"))
    )
    w = Window.partitionBy("g").orderBy("h")
    ranked = pairs.select("g", "h", F.row_number().over(w).alias("r"))
    kept = ranked.filter(F.col("r") <= k)
    return (
        kept.groupBy("g")
        .agg(F.max("h").alias("hk"), F.count("*").alias("n"), F.max("r").alias("rk"))
        .select(
            F.col("g").alias(group_col),
            F.round(
                F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
                    (k - 1) / F.col("hk")
                ),
                4,
            ).alias("est_distinct"),
        )
    )


def countmin_cells(
    items: DataFrame, item_col: str, *, depth: int = 3, width: int = 1024
) -> DataFrame:
    """The sketch itself: (row, col, c) counts over the item stream — one
    word-count aggregation after a depth-way explode."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    portable_hash64(F.concat(F.col(item_col), F.lit(f"#{i}"))),
                    F.lit(width),
                ).alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("cell"))
        .groupBy("cell.row", "cell.col")
        .agg(F.count("*").alias("c"))
    )


def countmin_estimate(
    items: DataFrame,
    item_col: str,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Estimated count for each probe value: min over its d cells. The
    probe set joins the (d·m)-row sketch — a broadcast-sized table by
    construction regardless of corpus size."""
    sketch = countmin_cells(items, item_col, depth=depth, width=width)
    probe_cells = probes.select(
        F.col(probe_col).alias("probe"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            portable_hash64(F.concat(F.col(probe_col), F.lit(f"#{i}"))),
                            F.lit(width),
                        ).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("probe", "cell.row", "cell.col")
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("probe")
        .agg(F.min("c").alias("est_count"))
    )
