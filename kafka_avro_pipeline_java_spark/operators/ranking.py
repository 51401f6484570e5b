"""Distributed global ranking over entity-scaled tables — two-phase scan.

A global ``Window.orderBy(...)`` with no ``partitionBy`` is a
single-partition sort (Spark warns "Moving all data to a single
partition"). That is fine for month- or decile-sized aggregates, but NOT
for per-customer or per-document tables: entity dimensions scale WITH the
corpus, and at 100 TB a billion-row single-partition sort is the plan
killer. The scalable form is the same two-phase scan
``operators/packing.py`` uses for sequence packing:

1. ``repartitionByRange`` on the sort key (which must include a unique
   tie-break so the order is total) + ``sortWithinPartitions``;
   ``localCheckpoint`` pins the sampled range boundaries so the offsets
   job and the output job see identical placement;
2. job 1: per-partition row counts (and optional weight totals) — one
   #partitions-row collect of scalar metadata, like a file listing;
3. job 2: per-row rank WITHIN each partition (parallel windows) + the
   partition's literal offset. ``ntile``/``percent_rank`` derive from the
   global row number and the now-known total count with the exact SQL
   semantics; inclusive running sums add the partition's weight offset.

Every derived column equals the single-partition window's output bit-for-
bit (given the total order), but no partition ever holds more than its
range slice, so the plan survives a 1000-executor 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sort_exprs(order_by: list[tuple[str, str]]) -> list[Column]:
    return [
        F.col(c).desc() if d == "desc" else F.col(c).asc()
        for c, d in order_by
    ]


def _ntile_expr(rn: Column, k: int, total: int) -> Column:
    """SQL NTILE(k) from the 1-based global row number column ``__rn``
    and the total row count: the first ``total % k`` tiles hold
    ``total // k + 1`` rows, the rest ``total // k`` (identical in Spark
    and DuckDB). Uses the SQL ``div`` operator so the math stays in
    int64 — float division + floor() loses exactness past 2^53."""
    q, r = divmod(total, k)
    if total == 0:
        return F.lit(None).cast("int")
    if r == 0:
        return F.expr(f"(__rn - 1) div {q} + 1").cast("int")
    cut = r * (q + 1)
    first = F.expr(f"(__rn - 1) div {q + 1} + 1")
    rest = F.expr(f"{r} + (__rn - {cut} - 1) div {max(q, 1)} + 1")
    return F.when(rn <= F.lit(cut), first).otherwise(rest).cast("int")


def attach_global_order_stats(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    *,
    row_number: str | None = None,
    percent_rank: str | None = None,
    ntile: tuple[int, str] | None = None,
    cumsum: tuple[str, str] | None = None,
    cummin_excl: tuple[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach global-order statistics over a TOTAL order without a
    single-partition window.

    ``order_by``: list of ``(column, "asc"|"desc")`` — together the keys
    MUST be unique (add an entity-key tie-break), both so the order is
    deterministic across engines and so rank == row_number (which
    ``percent_rank`` relies on).

    ``row_number``: output column for the 1-based global ROW_NUMBER
    (bigint). ``percent_rank``: output column for (rn−1)/(n−1) as SQL
    PERCENT_RANK computes it. ``ntile=(k, out)``: output column for SQL
    NTILE(k). ``cumsum=(weight_col, out)``: INCLUSIVE running sum of
    ``weight_col`` in the global order. ``cummin_excl=(col, out)``:
    EXCLUSIVE running min (rows strictly BEFORE this one — the
    ``rowsBetween(unboundedPreceding, -1)`` frame; null for the global
    first row), the sort-sweep primitive skyline-style operators need —
    min is associative, so the offset is just the min over all PRIOR
    partitions' minima.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    exprs = _sort_exprs(order_by)
    ranged = (
        df.repartitionByRange(n_parts, *exprs)
        .sortWithinPartitions(*exprs)
        .withColumn("__pid", F.spark_partition_id())
        # pin the sampled range boundaries: both jobs must see the rows
        # in identical partitions or the offsets are meaningless. LAZY
        # checkpoint: the offsets collect below is the first action, so
        # materialization piggybacks on it (one pass, not an extra job).
        # COST NOTE: every call materializes its full input onto executor
        # local storage with no lineage fallback — callers chaining
        # several stats over the SAME frame should batch them into ONE
        # call (row_number/ntile/cumsum/... compose here for exactly that
        # reason), and feed a pruned projection, not a wide fact table.
        .localCheckpoint(eager=False)
    )
    aggs = [F.count("*").cast("bigint").alias("__n")]
    if cumsum is not None:
        aggs.append(F.sum(cumsum[0]).cast("bigint").alias("__w"))
    if cummin_excl is not None:
        aggs.append(F.min(cummin_excl[0]).alias("__m"))
    per_part = {
        r["__pid"]: r for r in ranged.groupBy("__pid").agg(*aggs).collect()
    }
    row_off: dict[int, int] = {}
    w_off: dict[int, int] = {}
    m_off: dict[int, object] = {}
    acc_n, acc_w, acc_m = 0, 0, None
    for pid in sorted(per_part):
        row_off[pid] = acc_n
        acc_n += per_part[pid]["__n"]
        if cumsum is not None:
            w_off[pid] = acc_w
            acc_w += per_part[pid]["__w"] or 0
        if cummin_excl is not None:
            if acc_m is not None:
                m_off[pid] = acc_m
            m = per_part[pid]["__m"]
            if m is not None:
                acc_m = m if acc_m is None else min(acc_m, m)
    total = acc_n

    def _offset_map(offsets: dict[int, int]) -> Column:
        if not offsets:
            return F.lit(0)
        m = F.create_map(
            *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
        )
        return F.coalesce(F.element_at(m, F.col("__pid")), F.lit(0))

    w = Window.partitionBy("__pid").orderBy(*exprs)
    out = ranged
    if row_number or percent_rank or ntile:
        out = out.withColumn(
            "__rn",
            (_offset_map(row_off) + F.row_number().over(w)).cast("bigint"),
        )
    if row_number:
        out = out.withColumn(row_number, F.col("__rn"))
    if percent_rank:
        # unique total order => rank == row_number; n<=1 => 0.0 like SQL
        pr = (
            (F.col("__rn") - 1).cast("double") / F.lit(float(total - 1))
            if total > 1
            else F.lit(0.0)
        )
        out = out.withColumn(percent_rank, pr)
    if ntile:
        k, name = ntile
        out = out.withColumn(name, _ntile_expr(F.col("__rn"), k, total))
    if cumsum is not None:
        wc, name = cumsum
        cw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            name,
            (_offset_map(w_off) + F.sum(wc).over(cw)).cast("bigint"),
        )
    if cummin_excl is not None:
        mc, name = cummin_excl
        dtype = dict(ranged.dtypes)[mc]
        if m_off:
            mm = F.create_map(
                *[F.lit(x) for pid in m_off for x in (pid, m_off[pid])]
            )
            prior = F.element_at(mm, F.col("__pid")).cast(dtype)
        else:
            prior = F.lit(None).cast(dtype)
        mw = w.rowsBetween(Window.unboundedPreceding, -1)
        # least() skips nulls, so first-row-of-partition (null local min)
        # falls back to the prior-partitions bound and vice versa; the
        # global first row gets null from both — exactly the SQL frame
        out = out.withColumn(name, F.least(prior, F.min(mc).over(mw)))
    drop = ["__pid"] + (["__rn"] if "__rn" in out.columns else [])
    return out.drop(*[c for c in drop if c not in {row_number}])
