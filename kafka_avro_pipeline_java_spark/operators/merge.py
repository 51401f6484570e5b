"""SCD2 merge: slowly-changing-dimension type-2 upserts as a DataFrame
transform.

Parquet has no MERGE INTO; the idiomatic Spark answer is to EXPRESS the
merge relationally and rewrite the partition/table: close the current row
of every key whose attributes changed (valid_to = effective version) and
append the update as the new current row. History rows never move.

100 TB shape: one equi-join of updates against CURRENT rows only (the
valid_to IS NULL slice — a pushed-down scan filter), attribute-diff in the
join projection, and a union of branches that each read the dim scan
once. No mandatory broadcast hints: a CDC-tick-sized update batch is
broadcast by AQE on its runtime size, while an initial-load or
CDC-replay-sized batch falls back to a shuffle join instead of OOMing the
driver (same rationale as the k-core `keep` set — see
operators/graph.py). At warehouse scale this runs per-partition and
rewrites only partitions containing touched keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC change log into final table state (APPLY CHANGES /
    type-1 upsert with deletes): the highest-``seq_col`` change per key
    wins, and keys whose winning op is ``delete_op`` disappear.

    Equivalent of the reference pipeline's MySQL upsert leg
    (MySQLProcessData.java:67-73 ON DUPLICATE KEY UPDATE) generalized to a
    log with explicit deletes. ``seq_col`` must be unique per key (a Kafka
    (partition, offset) pair, a binlog GTID) — ties would make the winner
    engine-dependent.

    100 TB shape: ONE keyed aggregation with ``max_by`` over the payload
    struct — unlike the row_number()-window formulation this gets map-side
    partial aggregation (each input partition reduces to ≤ one row per
    local key before the shuffle), so a billion-row backlog for a
    million-row table shuffles ~table-sized, not log-sized. Delete filter
    is applied after the agg on the collapsed rows.
    """
    payload = [c for c in changes.columns if c not in keys]
    latest = changes.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(seq_col)).alias("__last")
    )
    return latest.select(*keys, "__last.*").filter(
        F.col(op_col) != F.lit(delete_op)
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    *,
    version_col: str = "valid_from",
    end_col: str = "valid_to",
    new_version,
) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension.

    ``dim``: (key, attrs..., valid_from, valid_to) with valid_to NULL on
    current rows. ``updates``: (key, attrs...). Rows whose attributes all
    match the current version are no-ops; changed keys get their current
    row closed at ``new_version`` and a fresh open row appended; keys absent
    from the dimension entirely are INSERTED as new open rows at
    ``new_version`` (nothing to close)."""
    cur = dim.filter(F.col(end_col).isNull())
    hist = dim.filter(F.col(end_col).isNotNull())
    u = updates.select(key, *attrs)
    # No F.broadcast hints anywhere in the merge: the updates batch and the
    # changed-key set are usually tiny (a CDC tick) and AQE broadcasts them
    # from their RUNTIME size — but a 100 TB initial load or a replayed CDC
    # backlog arrives through the same code path, and a mandatory hint
    # would pin an unbounded set on the driver (plan-property test:
    # test_scd2_updates_side_never_hint_broadcast).
    joined = cur.alias("c").join(
        u.alias("u"), F.col(f"c.{key}") == F.col(f"u.{key}")
    )
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{a}").eqNullSafe(F.col(f"u.{a}")) for a in attrs],
    )
    changed_keys = joined.filter(differs).select(
        F.col(f"c.{key}").alias(key)
    )
    closed = (
        cur.join(changed_keys, key, "left_semi")
        .withColumn(end_col, F.lit(new_version).cast(dim.schema[end_col].dataType))
    )
    fresh = (
        u.join(changed_keys, key, "left_semi")
        .withColumn(version_col, F.lit(new_version).cast(dim.schema[version_col].dataType))
        .withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType))
        .select(*dim.columns)
    )
    untouched_cur = cur.join(changed_keys, key, "left_anti")
    # Brand-new keys (no current row at all): pure inserts — open at
    # new_version, nothing to close. Without this branch an update whose key
    # is absent from the dimension would silently vanish (the changed_keys
    # inner join never sees it).
    inserted = (
        u.join(cur.select(key), key, "left_anti")
        .withColumn(version_col, F.lit(new_version).cast(dim.schema[version_col].dataType))
        .withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType))
        .select(*dim.columns)
    )
    return (
        hist.unionByName(untouched_cur)
        .unionByName(closed)
        .unionByName(fresh)
        .unionByName(inserted)
    )


def incremental_agg_apply(
    base_agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    *,
    count_col: str = "cnt",
    sum_cols: list[str] | None = None,
    sign_col: str = "sign",
) -> DataFrame:
    """Incremental materialized-view maintenance for a COUNT/SUM
    aggregate: fold a signed change stream into the stored aggregate
    without rescanning the base facts.

    ``base_agg``: (group_cols..., count_col, sum_cols...). ``delta``:
    (group_cols..., sign_col=+1 insert / −1 delete, sum_cols... carrying
    the row's measures). New groups appear via the full-outer join; a
    group whose maintained count reaches 0 is dropped (it no longer
    exists in the view).

    100 TB shape: the delta aggregates FIRST (map-side combined — a day's
    churn collapses to ≤ |touched groups| rows before any join), then one
    full-outer join against the stored agg, which at warehouse scale is
    partition-pruned to touched groups. COUNT and SUM are the
    self-maintainable aggregates; MIN/MAX under deletes need the base
    facts — see ``incremental_minmax_apply`` below, which recomputes
    bounds for dirty groups only via a semi-join-pruned rescan.
    """
    sum_cols = sum_cols or []
    d = delta.groupBy(*group_cols).agg(
        F.sum(sign_col).alias("__dc"),
        *[
            F.sum(F.col(c) * F.col(sign_col)).alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    joined = base_agg.join(d, group_cols, "full_outer")
    new_cnt = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("__dc"), F.lit(0)
    )
    cols = [*group_cols, new_cnt.alias(count_col)]
    for c in sum_cols:
        cols.append(
            (
                F.coalesce(F.col(c), F.lit(0.0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0.0))
            ).alias(c)
        )
    return joined.select(*cols).filter(F.col(count_col) > 0)


def incremental_minmax_apply(
    base_agg: DataFrame,
    delta: DataFrame,
    facts_after: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    count_col: str = "cnt",
    min_col: str = "mn",
    max_col: str = "mx",
    sign_col: str = "sign",
) -> DataFrame:
    """Incremental maintenance of (COUNT, MIN, MAX) per group — the
    non-self-maintainable half the COUNT/SUM fold above deliberately
    excluded. Algorithm (the standard warehouse pattern):

    - INSERTS are always algebraic: new_min = least(old, min(ins)),
      new_max = greatest(old, max(ins)), count += Σsign.
    - A DELETE only invalidates a bound when it can touch it: a group is
      DIRTY iff min(deleted) <= stored min (min side) or max(deleted) >=
      stored max (max side) — conservative under duplicate bound values
      (deleting one of two copies of the min keeps the min; we recompute
      anyway rather than track multiplicity).
    - Dirty groups — and ONLY dirty groups — recompute their bounds from
      ``facts_after`` via a left-semi join on the dirty keys. At 100 TB
      the rescan volume is the touched groups' rows (partition/file-
      pruned by the semi-join), never the base table; a day's churn
      usually dirties a vanishing fraction of groups.

    ``delta`` rows: (group_cols..., sign_col = +1/−1, value_col).
    ``facts_after``: the maintained fact table AFTER the delta is
    applied (what any warehouse has on disk post-merge). Groups whose
    maintained count reaches 0 drop from the view.
    """
    d = delta.groupBy(*group_cols).agg(
        F.sum(sign_col).cast("bigint").alias("__dc"),
        F.min(F.when(F.col(sign_col) > 0, F.col(value_col))).alias("__ins_mn"),
        F.max(F.when(F.col(sign_col) > 0, F.col(value_col))).alias("__ins_mx"),
        F.min(F.when(F.col(sign_col) < 0, F.col(value_col))).alias("__del_mn"),
        F.max(F.when(F.col(sign_col) < 0, F.col(value_col))).alias("__del_mx"),
    )
    j = base_agg.join(d, group_cols, "full_outer")
    new_cnt = (
        F.coalesce(F.col(count_col), F.lit(0))
        + F.coalesce(F.col("__dc"), F.lit(0))
    ).cast("bigint")
    # A group is dirty when a delete can touch a stored bound — OR when
    # deletes hit a group with no stored bounds at all (a brand-new group
    # whose delta both inserts and deletes in the same batch: the insert
    # path would otherwise keep the deleted value as the bound).
    dirty = F.col("__del_mn").isNotNull() & (
        F.col(min_col).isNull()
        | (F.col("__del_mn") <= F.col(min_col))
        | (F.col("__del_mx") >= F.col(max_col))
    )
    merged = j.select(
        *group_cols,
        new_cnt.alias(count_col),
        F.least(F.col(min_col), F.col("__ins_mn")).alias(min_col),
        F.greatest(F.col(max_col), F.col("__ins_mx")).alias(max_col),
        dirty.alias("__dirty"),
    ).filter(F.col(count_col) > 0)
    clean = merged.filter(~F.col("__dirty")).drop("__dirty")
    dirty_keys = merged.filter(F.col("__dirty")).select(*group_cols, count_col)
    rescanned = (
        facts_after.join(dirty_keys.select(*group_cols), group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias(min_col),
            F.max(value_col).alias(max_col),
        )
        .join(dirty_keys, group_cols)
        .select(*group_cols, count_col, min_col, max_col)
    )
    return clean.unionByName(rescanned)
