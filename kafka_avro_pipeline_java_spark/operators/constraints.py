"""Declarative data-quality constraint checking (deequ/dbt-test-style).

A warehouse is only as good as the invariants it can PROVE about its
tables: primary-key uniqueness, referential integrity, null-freedom,
range and set membership. Each rule compiles to the cheapest plan that
answers "how many rows violate this?":

- not_null / range / in_set  → a single-scan filter count (predicates
  push down; several rules over one table share one scan via a single
  aggregate of CASE counts);
- unique                     → one keyed aggregation, Σ (count − 1)
  over duplicated keys;
- foreign_key                → a left-anti join against the referenced
  key set (broadcast when the dimension is bounded).

Output is one row per rule: (rule, n_violations) — the report a data
contract gates deploys on. All counts are exact integers, so the whole
report is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_not_null(df: DataFrame, col: str) -> Column:
    return F.sum(F.col(col).isNull().cast("long"))


def violations_predicate(df: DataFrame, pred: Column) -> Column:
    """Count rows FAILING the stated invariant, NULL-safely.

    deequ/dbt semantics: a row where the predicate evaluates to NULL (e.g.
    ``o_totalprice IS NULL`` under ``totalprice > 0``) is an UNPROVABLE
    invariant and counts as a violation — ``WHEN pred THEN 0 ELSE 1``
    rather than ``sum(NOT pred)``, which would silently skip NULLs."""
    return F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1)).cast("long"))


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """1-row frame: rows beyond the first per duplicated key."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
            ).cast("long").alias("n")
        )
    )


def foreign_key_violations(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str,
    *, broadcast_parent: bool = True,
) -> DataFrame:
    """1-row frame: child rows whose key has no parent."""
    p = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    return (
        child.join(p, child_col, "left_anti")
        .agg(F.count("*").cast("long").alias("n"))
    )
