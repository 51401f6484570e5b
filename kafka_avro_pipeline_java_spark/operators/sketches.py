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
        .agg(F.max("h").alias("hk"), F.count("*").alias("n"))
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
    items: DataFrame,
    item_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """The sketch itself: (row, col, c) counts over the item stream — one
    word-count aggregation after a depth-way explode.

    ``weight_col`` (r14): build from a pre-aggregated (item, count) table
    instead of the raw stream — cell value = Σ weights of the items
    hashing there, exactly the occurrence count the raw stream yields
    (integer regrouping), but the depth-way explode runs over the
    type-scale table instead of the corpus."""
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
    extra = [F.col(weight_col)] if weight_col else []
    agg = (
        F.sum(weight_col).alias("c")
        if weight_col
        else F.count("*").alias("c")
    )
    return (
        items.select(F.explode(cells).alias("cell"), *extra)
        .groupBy("cell.row", "cell.col")
        .agg(agg)
    )


def countmin_estimate(
    items: DataFrame,
    item_col: str,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Estimated count for each probe value: min over its d cells. The
    probe set joins the (d·m)-row sketch — a broadcast-sized table by
    construction regardless of corpus size.

    The sketch table materializes only NON-ZERO cells, so the join is a
    LEFT join with absent cells coalesced to 0: a probe never seen in the
    stream reports est_count 0 (its empty cells win the min) instead of
    vanishing from the output or taking min() over only its occupied
    cells — the true 'min over all d cells' Count-Min semantics."""
    sketch = countmin_cells(
        items, item_col, depth=depth, width=width, weight_col=weight_col
    )
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
        probe_cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .select("probe", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .groupBy("probe")
        .agg(F.min("c").alias("est_count"))
    )


def hll_distinct(
    df: DataFrame, group_col: str, key_col: str, *, m: int = 64
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate with PORTABLE,
    integer-exact register math: (group, est_distinct).

    bucket = h mod m (low bits); rho = rank of the leading 1-bit in the
    remaining 54 hash bits (0 keys → register 0). The harmonic mean is
    computed as the INTEGER Σ 2^(55−M_j) (≤ m·2^55 < 2^63 — no float
    accumulation, so the sum is order-independent and engines agree
    bit-for-bit); E = α_m·m²·2^55 / Σ, with the standard linear-counting
    fallback m·ln(m/V) below 2.5m when empty registers remain. Unlike
    KMV's per-group k-hash state, HLL state is m bytes and register max
    is a partial aggregate — the cheapest mergeable distinct sketch.
    """
    regs = hll_registers(df, group_col, key_col, m=m)
    return hll_estimate_from_registers(regs, m=m).withColumnRenamed(
        "g", group_col
    )


def hll_registers(
    df: DataFrame, group_col: str, key_col: str, *, m: int = 64
) -> DataFrame:
    """The HLL sketch STATE itself: (g, bk, mj) — per-group occupied
    registers (bucket, max rho). Exposed separately because register rows
    MERGE by plain max: unions of sketches, sliding windows over
    per-period sketches, and cross-shard combines are all one
    groupBy(g, bk).max(mj) away (the mergeability that makes HLL the
    distinct sketch of choice for partial aggregation)."""
    assert m & (m - 1) == 0, "m must be a power of two"
    import math as _math

    b = int(_math.log2(m))
    rest_bits = 60 - b
    h = portable_hash64(F.col(key_col).cast("string"))
    bucket = F.pmod(h, F.lit(m))
    # exact integer h // m: float division would drop low bits at 2^60
    rest = F.shiftright(h, b)
    # integer-exact bit length: length of the minimal binary string. One
    # codegen string op per row — measured 5.5 s -> ~1 s at sf0.1 vs the
    # previous 54-element sequence+filter lambda, with identical values
    # (bin(x) has exactly bit_length(x) digits for x >= 1; 0 guarded).
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = F.lit(rest_bits + 1) - bitlen  # rest==0 -> rho = rest_bits + 1
    return (
        df.select(F.col(group_col).alias("g"), bucket.alias("bk"), rho.alias("r"))
        .groupBy("g", "bk")
        .agg(F.max("r").alias("mj"))
    )


def hll_estimate_from_registers(regs: DataFrame, *, m: int = 64) -> DataFrame:
    """(g, est_distinct) from occupied register rows (g, bk, mj) — the
    integer-exact harmonic-mean estimate described in hll_distinct."""
    import math as _math

    b = int(_math.log2(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    rest_bits = 60 - b
    # Σ 2^(55-M_j) over occupied registers + (m - occupied) · 2^55 for empty
    top = rest_bits + 1
    per_g = regs.groupBy("g").agg(
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.lit(top) - F.col("mj")
            )
        ).alias("isum"),
        F.count("*").alias("occ"),
    )
    full = per_g.select(
        "g",
        (
            F.col("isum")
            + (F.lit(m) - F.col("occ"))
            * F.lit(1 << top).cast("long")
        ).alias("isum"),
        (F.lit(m) - F.col("occ")).alias("v"),
    )
    e_raw = F.lit(alpha * m * m * float(1 << top)) / F.col("isum")
    est = F.when(
        (e_raw <= 2.5 * m) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(e_raw)
    return full.select("g", F.round(est, 4).alias("est_distinct"))


def countmin_inner_product(
    a_items: DataFrame,
    a_col: str,
    b_items: DataFrame,
    b_col: str,
    *,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Equi-join cardinality estimate WITHOUT running the join: the
    Count-Min inner-product estimator min_r Σ_col A[r,col]·B[r,col]
    (an upper bound on Σ_k c_A(k)·c_B(k) — collisions only add). The
    planner-style use: each side reduces to d·m counters (two word-count
    aggs); the estimate is a join of two broadcast-sized sketches. Exact
    answer costs the full shuffle join this estimator is priced to
    avoid."""
    # r14: aggregate each side to per-key counts FIRST (map-side combine
    # over the raw key, §2.3), so the depth-way explode + md5 cell hashing
    # runs over the KEY-scale table instead of the corpus — the weighted
    # cells are the identical integers (the weight_col regrouping pinned
    # by test_countmin_weighted_cells_match_raw_stream).
    a_counts = a_items.groupBy(a_col).agg(F.count("*").alias("__w"))
    b_counts = b_items.groupBy(b_col).agg(F.count("*").alias("__w"))
    ca = countmin_cells(a_counts, a_col, depth=depth, width=width,
                        weight_col="__w")
    cb = countmin_cells(b_counts, b_col, depth=depth, width=width,
                        weight_col="__w")
    prod = (
        ca.alias("a")
        .join(cb.alias("b"), ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("s"))
    )
    return prod.agg(F.min("s").cast("bigint").alias("est_rows"))


def misra_gries_partition_summaries(
    items: DataFrame, item_col: str, *, k: int = 64
) -> DataFrame:
    """Per-partition Misra–Gries frequent-items summaries: ≤ ``k``
    surviving (item, weight) rows per input partition.

    The guarantee that makes this the scalable heavy-hitter prefilter: an
    item with true partition frequency f has MG weight ≥ f − n_p/k, so any
    item with f > n_p/k SURVIVES its partition's summary — and by the
    averaging argument a GLOBAL heavy hitter (freq > n/k) must exceed
    n_p/k in at least one partition, so the union of partition survivors
    is a superset of the global heavy hitters (Misra & Gries 1982;
    mergeability per Agarwal et al., "Mergeable Summaries", PODS'12).
    Candidate set is ≤ k·P rows total — broadcastable — so the exact
    second pass in ``heavy_hitters_exact`` is a broadcast semi-join, never
    a full-vocabulary aggregation.

    Decrement-all is amortized O(1)/element: each k-way decrement retires
    k previously-added count units. State is one dict of ≤ k counters per
    partition, independent of partition size.
    """
    import pandas as pd  # noqa: PLC0415  (executor-side import)

    out_schema = f"{item_col} string, weight long"

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for it in pdf[item_col]:
                if it is None:
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {item_col: list(counters.keys()), "weight": list(counters.values())}
        )

    return items.select(item_col).mapInPandas(summarize, schema=out_schema)


def heavy_hitters_exact(
    items: DataFrame, item_col: str, *, k: int = 64
) -> DataFrame:
    """EXACT heavy hitters (items with frequency > n/k) via the two-pass
    sketch-prefilter plan a 100 TB corpus needs:

    pass 1 — per-partition Misra–Gries summaries (above) reduce the
    stream to ≤ k·P candidate items with zero false negatives;
    pass 2 — broadcast LEFT-SEMI join of the stream against the candidate
    set, exact recount of candidates only, filter freq > n/k.

    The naive single-pass alternative (groupBy item → filter) aggregates
    the FULL vocabulary — 10⁸⁺ groups at corpus scale — to keep a handful
    of rows; here the shuffled agg only ever sees candidate rows. Output
    is exact and engine-independent (the sketch affects WORK, not the
    answer), which is why the DuckDB oracle can hash-match it.
    """
    cand = (
        misra_gries_partition_summaries(items, item_col, k=k)
        .select(item_col)
        .distinct()
    )
    total = items.agg(F.count(item_col).cast("double").alias("n_total"))
    counted = (
        items.join(F.broadcast(cand), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_total") / F.lit(float(k)))
        .select(item_col, "cnt")
    )


def kmv_sketches(df: DataFrame, group_col: str, key_col: str, *,
                 k: int = 64) -> DataFrame:
    """(g, h): the per-group KMV sketch ROWS (k smallest unit hashes of
    the distinct keys) — the mergeable state kmv_distinct estimates from,
    exposed so set operations can combine sketches without re-touching
    the corpus."""
    from pyspark.sql.window import Window

    pairs = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("key"))
        .distinct()
        .select("g", _unit_hash(F.col("key").cast("string")).alias("h"))
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        pairs.select("g", "h", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= k)
        .select("g", "h")
    )


def kmv_set_ops(df: DataFrame, group_col: str, key_col: str, *,
                k: int = 64) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS between every pair of groups,
    computed purely from the k-row KMV sketches (Beyer et al. 2007 /
    the DataSketches theta estimator family):

    - union: KMV estimate over the k smallest of sketch_a ∪ sketch_b;
    - jaccard: ρ/n where ρ = union-sketch hashes present in BOTH input
      sketches and n = |union sketch| (≤ k) — exact when the true union
      fits the sketch;
    - intersection: jaccard × union.

    → (g_a, g_b, est_union, est_jaccard, est_intersect), g_a < g_b.

    Scale shape: the ONLY corpus-sized work is the distinct+hash pass
    inside ``kmv_sketches``; everything after operates on ≤ k rows per
    group (G groups → G·k rows, G² pairs of k-row joins). Estimating the
    overlap of two 10¹⁰-key sets costs two sketch builds + a driver-cheap
    combine — the planner-style use, same as countmin_inner_product.
    Deterministic: pure integer-portable-hash math, so the estimates
    themselves are oracle-checkable bit-for-bit."""
    from pyspark.sql.window import Window

    # r14: sk fed the group list, the union explode and both membership
    # probes — four derivations of the corpus distinct+hash pass (16
    # parquet scans in sketch_kmv_setops' plan); uk fed the union stats
    # and the intersection count. Both are ≤ G·k / G²·k rows —
    # materialize each once (§2.4).
    sk = kmv_sketches(df, group_col, key_col, k=k).localCheckpoint(eager=False)
    groups = sk.select("g").distinct()
    combos = (
        groups.select(F.col("g").alias("g_a"))
        .join(groups.select(F.col("g").alias("g_b")),
              F.col("g_a") < F.col("g_b"))
    )
    # union sketch per pair: k smallest distinct hashes of the two sketches
    u = (
        combos.join(sk.alias("s"),
                    (F.col("s.g") == F.col("g_a"))
                    | (F.col("s.g") == F.col("g_b")))
        .select("g_a", "g_b", "s.h")
        .distinct()
    )
    wu = Window.partitionBy("g_a", "g_b").orderBy("h")
    uk = (
        u.select("g_a", "g_b", "h", F.row_number().over(wu).alias("r"))
        .filter(F.col("r") <= k)
        .select("g_a", "g_b", "h")
    ).localCheckpoint(eager=False)
    ustats = uk.groupBy("g_a", "g_b").agg(
        F.max("h").alias("hk"), F.count("*").alias("n")
    )
    sa = sk.select(F.col("g").alias("g_a"), F.col("h").alias("h"))
    sb = sk.select(F.col("g").alias("g_b"), F.col("h").alias("h"))
    rho = (
        uk.join(sa, ["g_a", "h"], "left_semi")
        .join(sb, ["g_b", "h"], "left_semi")
        .groupBy("g_a", "g_b")
        .agg(F.count("*").alias("rho"))
    )
    est_u = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        (k - 1) / F.col("hk")
    )
    jac = F.coalesce(F.col("rho"), F.lit(0)) / F.col("n")
    return (
        ustats.join(rho, ["g_a", "g_b"], "left_outer")
        .select(
            "g_a",
            "g_b",
            F.round(est_u, 4).alias("est_union"),
            F.round(jac, 4).alias("est_jaccard"),
            F.round(jac * est_u, 4).alias("est_intersect"),
        )
    )
