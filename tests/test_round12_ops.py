"""Round-12 property tests: the 48-bit md5-prefix fingerprint contract
behind agg_table_fingerprint (Spark conv() vs Python int(hex,16) vs the
DuckDB '0x'-cast, and the FLOOR-quantizer tie behavior)."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F


def test_conv_48bit_hex_matches_python_and_duckdb(spark):
    """agg_table_fingerprint's per-row hash is conv(substr(md5(s),1,12),
    16,10) cast to BIGINT — pin that Spark's conv on a 12-hex-digit
    (48-bit) prefix equals Python's int(hex,16) AND DuckDB's
    ('0x'||prefix)::BIGINT for strings covering leading-zero, all-f and
    ordinary prefixes. 48 bits never exceeds BIGINT, so the cast is
    lossless by construction; this test pins the base-conversion path on
    all three engines."""
    samples = [
        "1|10|O|17345|1996-01-02|5-LOW",
        "",
        "a",
        "leading-zero-md5-hunt-%d",
    ]
    # hunt a string whose md5 prefix has a leading zero so the test
    # covers the zero-pad class deterministically
    probe = next(
        s for s in (samples[-1] % i for i in range(200))
        if hashlib.md5(s.encode()).hexdigest().startswith("0")
    )
    samples[-1] = probe
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s",
        F.conv(F.substring(F.md5("s"), 1, 12), 16, 10).cast("bigint").alias("fp"),
    )
    got = {r["s"]: r["fp"] for r in sdf.collect()}
    con = duckdb.connect()
    for s in samples:
        expect = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        assert got[s] == expect, (s, got[s], expect)
        duck = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 12)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert duck == expect, (s, duck, expect)


def test_floor_quantizer_agrees_on_half_ties(spark):
    """The house FLOOR(x*100+0.5) cents quantizer must agree between
    Spark and DuckDB on the exact-tie class that splits ROUND(x*100,0):
    doubles whose *100 lands exactly on .5 in binary (x = k + 0.005
    representable ties like 128.005 → 12800.5). ROUND diverges here
    (Spark HALF_UPs the shortest-repr decimal, DuckDB rounds the binary
    value); FLOOR(x+0.5) is a single binary add + floor on both engines."""
    # values chosen so x*100 is EXACTLY n+0.5 in float64
    ties = [(2**i + 0.5) / 100.0 * (2**0) for i in range(4, 10)]
    ties = [t for t in ties if (t * 100) % 1 == 0.5]
    assert ties, "need at least one exact .5 tie in the probe set"
    sdf = spark.createDataFrame([(v,) for v in ties], ["x"]).select(
        F.floor(F.col("x") * 100 + F.lit(0.5)).cast("bigint").alias("c")
    )
    got = [r["c"] for r in sdf.collect()]
    con = duckdb.connect()
    for v, g in zip(ties, got):
        d = con.execute(
            "SELECT CAST(FLOOR(? * 100 + 0.5) AS BIGINT)", [v]
        ).fetchone()[0]
        p = int((v * 100) + 0.5)
        assert g == d == p, (v, g, d, p)
