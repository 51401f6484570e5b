"""Registry mapping query name → (spark, sf_dir) -> DataFrame, plus the
equivalent DuckDB oracle SQL used by the driver's correctness harness.

Conventions (driver contract, see repo-root ``__spark_entry__.py``):
- every computed column is aliased IDENTICALLY in the Spark plan and the SQL;
- floating-point aggregates are rounded in BOTH plans (the driver hash is
  exact, and double summation order differs between engines);
- sums over integer-domain columns are CAST to BIGINT in the SQL (DuckDB
  promotes integer SUM to HUGEINT, Spark keeps LongType);
- top-k queries order by the ROUNDED measure with a unique-key tiebreak so
  the selected row set is engine-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings). ``oracle=None`` → driver runs rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
