"""The r9 gamma-fit overflow lesson, pinned as a regression test.

`stats_gamma_fit_interarrival` first shipped with a BIGINT product of two
large ints formed BEFORE the decimal(38,0) cast; at sf0.001 the values
stayed under 2^63 and the sweep passed, at sf0.01 the moment Σgap²
overflowed int64 (fixed in 4989abf). The repo-wide OVERFLOW RULE since:
cast ONE operand to decimal(38,0) before any product of large ints, and
check decimal-moment queries at TWO scale factors (tools/driver_sim.py now
runs every oracle mentioning decimal(38/HUGEINT at the sibling SF too —
single-SF green is not green for big moments).

This test names a deliberately overflowing moment — Σx² at x just above
√(2^63−1) — and pins both failure shapes: under Spark 4's default ANSI
mode the bigint product RAISES (the query dies at one SF and not another);
the decimal(38,0)-before-product pipeline is exact everywhere. If Spark
ever stops raising here, the assert flags it so the rule's rationale gets
re-derived rather than silently trusted.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401  (doc import)


def test_bigint_square_overflows_and_decimal_does_not(spark):
    # x² ≈ 9.224e18, a hair over int64 max (9.223372036854775807e18):
    # ONE row already overflows the bigint product.
    x = 3_037_000_500  # ceil(sqrt(2^63 - 1)) + 1 > int64-safe square root
    df = spark.createDataFrame([(x,), (x,)], "v long")
    exact = 2 * x * x  # python ints are unbounded

    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(F.sum(F.col("v") * F.col("v")).alias("s")).collect()

    exact_sum = df.agg(
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("s")
    ).collect()[0]["s"]
    assert int(exact_sum) == exact


def test_decimal_cast_must_hit_an_operand_not_the_product(spark):
    # the precise r9 bug shape: a cast applied to the already-formed
    # bigint product is too late — the product itself is what overflows
    x = 3_037_000_500
    df = spark.createDataFrame([(x,)], "v long")
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(
            F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s")
        ).collect()
    # sub-threshold values stay exact on the plain bigint path (why the
    # bug passed at sf0.001: the moment never crossed 2^63 there)
    y = 3_000_000_000
    small = spark.createDataFrame([(y,)], "v long")
    got = small.agg(F.sum(F.col("v") * F.col("v")).alias("s")).collect()[0]["s"]
    assert got == y * y
