"""Data-layout queries: the Z-order curve code that drives multi-column
clustering (sources/layout.py::write_zordered).

The code itself is registered as an oracle query — pure integer bit
arithmetic after a min-max scale, so DuckDB reproduces every value — and
the layout EFFECT (per-file min/max ranges tight on BOTH columns) is
pinned by tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.layout import _scaled, morton_code
from .registry import query

_BITS = 8


@query(
    "layout_zorder_code",
    oracle=f"""
    WITH stats AS (
      SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
             MIN(o_totalprice) AS ymin, MAX(o_totalprice) AS ymax
      FROM orders
    ), scaled AS (
      SELECT o_orderkey,
             LEAST(CAST(FLOOR(
               CASE WHEN xmax - xmin > 0
                    THEN (o_custkey - xmin) / CAST(xmax - xmin AS DOUBLE)
                    ELSE 0 END * {(1 << _BITS) - 1}) AS BIGINT),
               {(1 << _BITS) - 1}) AS sx,
             LEAST(CAST(FLOOR(
               CASE WHEN ymax - ymin > 0
                    THEN (o_totalprice - ymin) / CAST(ymax - ymin AS DOUBLE)
                    ELSE 0 END * {(1 << _BITS) - 1}) AS BIGINT),
               {(1 << _BITS) - 1}) AS sy
      FROM orders, stats
    )
    SELECT o_orderkey,
           CAST(SUM((((sx >> i.i) & 1) << (2 * i.i))
                    + (((sy >> i.i) & 1) << (2 * i.i + 1))) AS BIGINT) AS zcode
    FROM scaled, UNNEST(range(0, {_BITS})) AS i(i)
    GROUP BY o_orderkey
    """,
)
def layout_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) curve code over (o_custkey, o_totalprice): the
    clustering key write_zordered sorts by, so every parquet file covers
    a small rectangle of the 2-D space and min/max stats prune range
    predicates on EITHER column. Min-max scale from a broadcast 1-row
    agg, then pure integer bit interleave — one projection, and the
    oracle checks every code value."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_custkey").alias("xmin"), F.max("o_custkey").alias("xmax"),
        F.min("o_totalprice").alias("ymin"), F.max("o_totalprice").alias("ymax"),
    )
    return o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        morton_code(
            _scaled(F.col("o_custkey"), F.col("xmin"), F.col("xmax"), _BITS),
            _scaled(F.col("o_totalprice"), F.col("ymin"), F.col("ymax"), _BITS),
            bits=_BITS,
        ).alias("zcode"),
    )
