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


SF_DIR = "/root/testdata/sf0.001"


def test_multi_source_hops_tiny_graph(spark):
    """Per-seed distances on a hand-built path-plus-branch graph: the
    (seed, node) frontier must keep seeds separate (bfs_hops would fold
    them into one min) and report true shortest hops within the bound."""
    from kafka_avro_pipeline_java_spark.operators.graph import multi_source_hops

    # undirected path 1-2-3-4 plus branch 2-5; hubs by degree: 2 (deg 3)
    # then 3 (deg 2); with n_seeds=2 those are the seeds.
    und = [(1, 2), (2, 3), (3, 4), (2, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    got = {
        (r["seed"], r["node"]): r["hops"]
        for r in multi_source_hops(edges, max_hops=3, n_seeds=2).collect()
    }
    assert got[(2, 2)] == 0 and got[(2, 1)] == 1 and got[(2, 4)] == 2
    assert got[(3, 3)] == 0 and got[(3, 1)] == 2 and got[(3, 5)] == 2
    # two distinct seeds, all nodes reachable within 3 hops
    assert len({s for s, _ in got}) == 2
    assert len(got) == 10


def test_harmonic_closeness_bounds(spark):
    """h(s) <= n_reached (each 1/d term is <= 1) and n_reached >= degree
    of the seed (all neighbors are at distance 1)."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    rows = QUERIES["graph_harmonic_closeness"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 4
    for r in rows:
        assert 0 <= r["harmonic"] <= r["n_reached"] + 1e-9


def test_textrank_scores_positive_and_ranked(spark):
    """TextRank output: 20 rows, scores positive (every node keeps the
    (1-d) teleport mass), non-increasing in rank order."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    rows = QUERIES["text_textrank_keywords"](spark, SF_DIR).collect()
    assert len(rows) == 20
    scores = [r["textrank"] for r in rows]
    assert all(s >= 0.15 - 1e-9 for s in scores)  # >= (1-d)
    assert scores == sorted(scores, reverse=True)


def test_levene_matches_python_reference(spark):
    """Recompute Brown-Forsythe W from the parquet directly (numpy-free
    exact Python) and compare to the query's quantized output."""
    import duckdb

    from kafka_avro_pipeline_java_spark.plans import QUERIES

    got = QUERIES["stats_levene_brown_forsythe"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    from collections import defaultdict
    import statistics

    by = defaultdict(list)
    for gname, cents in rows:
        by[gname].append(cents)
    z = {gname: [abs(c - statistics.median(v)) for c in v] for gname, v in by.items()}
    nt = sum(len(v) for v in z.values())
    k = len(z)
    zbar = sum(sum(v) for v in z.values()) / nt
    ssb = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in z.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in z.values())
    w_ref = (nt - k) / (k - 1) * ssb / ssw
    assert abs(got["w_stat"] - w_ref) < 1e-3
    assert got["n_total"] == nt and got["n_groups"] == k


def test_t_closeness_thresholds_monotone(spark):
    """TVD is in [0, 1], and the class counts above increasing t
    thresholds are non-increasing."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    r = QUERIES["privacy_t_closeness_audit"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["max_t"] <= 1.0
    assert r["classes_t_gt_020"] >= r["classes_t_gt_035"] >= r["classes_t_gt_050"]
    assert r["classes_t_gt_020"] <= r["n_classes"]


def test_square_wave_contrast_reference(spark):
    """Recompute the period-24 square-wave contrast in pure Python from
    the parquet and compare exactly (everything is integer)."""
    import duckdb

    from kafka_avro_pipeline_java_spark.plans import QUERIES

    got = {
        r["period_hours"]: r["contrast_n"]
        for r in QUERIES["events_square_wave_periodogram"](spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    hours = con.execute(
        f"""SELECT CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                                  date_trunc('hour', ts)) AS BIGINT),
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
    ).fetchall()
    n = len(hours)
    sy = sum(y for _, y in hours)
    for p in (2, 24):
        sys_ = sum(y * (1 if 2 * (t % p) < p else -1) for t, y in hours)
        ss = sum(1 if 2 * (t % p) < p else -1 for t, _ in hours)
        assert got[p] == abs(n * sys_ - sy * ss)


def test_shuffle_skew_forecast_invariants(spark):
    """Bucket counts sum to the corpus, the skew factor is >= 1, and
    every bucket holds at least one key."""
    import duckdb

    from kafka_avro_pipeline_java_spark.plans import QUERIES

    rows = QUERIES["layout_shuffle_skew_forecast"](spark, SF_DIR).collect()
    con = duckdb.connect()
    total = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert sum(r["n_rows"] for r in rows) == total
    assert all(r["n_keys"] >= 1 for r in rows)
    assert rows[0]["skew_factor"] >= 1.0


def test_duckdb_decimal_literal_vs_double_floor(spark):
    """Pin the r12 self-review lesson: DuckDB's bare 0.85 is DECIMAL(3,2),
    so 0.85*w stays exact where Spark's float64 path already rounded -
    FLOOR flips by one on boundary terms. The oracle-side fix is
    CAST(0.85 AS DOUBLE); this test keeps the divergence visible and the
    fix honest on the concrete triple that reproduced it."""
    import math

    import duckdb

    con = duckdb.connect()
    w, wd, r = 193, 3281, 1978490850
    duck_decimal = con.execute(
        f"SELECT FLOOR(0.85 * {w} / {wd} * {r} + 0.5)"
    ).fetchone()[0]
    duck_double = con.execute(
        f"SELECT FLOOR(CAST(0.85 AS DOUBLE) * {w} / {wd} * {r} + 0.5)"
    ).fetchone()[0]
    py_double = math.floor(0.85 * w / wd * r + 0.5)
    from pyspark.sql import functions as F

    spark_val = (
        spark.range(1)
        .select(
            F.floor(
                F.lit(0.85) * F.lit(w) / F.lit(wd) * F.lit(r) + F.lit(0.5)
            ).alias("v")
        )
        .collect()[0]["v"]
    )
    # the divergence exists...
    assert duck_decimal != py_double
    # ...and the CAST fix restores three-way agreement
    assert duck_double == py_double == spark_val


def test_holm_dominates_bh_and_is_monotone(spark):
    """Holm adjusted p-values are monotone non-decreasing in rank order,
    >= the raw p, and pointwise >= the BH adjustment on the same tests
    (FWER control is strictly stronger than FDR control)."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    holm = {
        (r["src_a"], r["src_b"]): r
        for r in QUERIES["stats_holm_bonferroni"](spark, SF_DIR).collect()
    }
    bh = {
        (r["src_a"], r["src_b"]): r["p_adjusted"]
        for r in QUERIES["stats_fdr_bh_sources"](spark, SF_DIR).collect()
    }
    assert set(holm) == set(bh) and len(holm) >= 3
    ordered = sorted(holm.values(), key=lambda r: (r["p_value"], r["src_a"], r["src_b"]))
    adj = [r["p_adjusted"] for r in ordered]
    assert adj == sorted(adj)
    for k, r in holm.items():
        assert r["p_adjusted"] >= r["p_value"] - 1e-9
        assert r["p_adjusted"] >= bh[k] - 1e-9


def test_filtered_bool_zoo_consistency(spark):
    """FILTERed counts are bounded by the group count, the boolean folds
    match their definitions, and finished cents is NULL only when the
    group has no 'F' rows."""
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    rows = QUERIES["agg_filtered_bool_zoo"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_large"] <= r["n_orders"]
        assert r["all_positive"] is True  # order totals are positive
        assert r["open_customers"] <= r["n_orders"]
