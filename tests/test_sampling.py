"""Error bounds for the approximate/sampled operators vs exact values."""

import pytest
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.plans import QUERIES
from kafka_avro_pipeline_java_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    got = {
        r["o_orderpriority"]: r["n_customers_approx"]
        for r in QUERIES["approx_distinct_customers"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(3, 0.1 * e), (k, got[k], e)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    got = {r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
           for r in QUERIES["approx_percentile_prices"](spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: (r["p50"], r["p95"])
             for r in QUERIES["agg_percentiles"](spark, sf_dir).collect()}
    for k, (p50, p95) in exact.items():
        assert abs(got[k][0] - p50) / p50 < 0.05
        assert abs(got[k][1] - p95) / p95 < 0.05


def test_sample_fraction_and_determinism(spark, sf_dir):
    n_total = load_table(spark, sf_dir, "lineitem").count()
    a = QUERIES["sample_lineitem"](spark, sf_dir).agg(F.sum("n_sampled")).first()[0]
    b = QUERIES["sample_lineitem"](spark, sf_dir).agg(F.sum("n_sampled")).first()[0]
    assert a == b  # seeded → deterministic
    assert 0.05 * n_total < a < 0.15 * n_total


def test_sample_per_source_exact_quota_and_determinism(spark, sf_dir):
    """Exactly k rows per stratum, and the seeded-hash rank makes the
    selection identical across runs (a reservoir any engine reproduces)."""
    out1 = QUERIES["pipeline_sample_per_source"](spark, sf_dir).collect()
    counts = {}
    for r in out1:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    assert len(counts) == n_sources
    assert all(c == 5 for c in counts.values()), counts
    out2 = QUERIES["pipeline_sample_per_source"](spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_ddsketch_relative_error_bound(spark, sf_dir):
    """DDSketch guarantee: every estimate is within alpha=1% RELATIVE
    error of the true quantile (modulo the rank convention at tiny n —
    allow 2*alpha to absorb the rank-interpolation difference vs Spark's
    exact `percentile`)."""
    got = {
        (r["l_returnflag"], r["q"]): r["price_est"]
        for r in QUERIES["sketch_ddsketch_quantiles"](spark, sf_dir).collect()
    }
    exact = {
        (r["l_returnflag"], q): r[f"p{int(q * 100)}"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.50)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
        for q in (0.50, 0.95, 0.99)
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / e <= 0.02, (k, got[k], e)


def test_ddsketch_histogram_merges_by_addition(spark, sf_dir):
    """The sketch state is a bucket->count map, so the merge of two
    partial sketches is plain count addition — build the histogram on two
    disjoint halves, add, and compare against the whole-table histogram
    (this is the associativity a 1000-executor partial agg relies on)."""
    import math

    l = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    gamma = 101.0 / 99.0

    def hist(df):
        rows = (
            df.groupBy(
                F.ceil(
                    F.round(F.log("l_extendedprice") / math.log(gamma), 9)
                ).alias("b")
            )
            .count()
            .collect()
        )
        return {r["b"]: r["count"] for r in rows}

    whole = hist(l)
    even = hist(l.filter(F.col("l_extendedprice") * 100 % 2 == 0))
    odd = hist(l.filter(F.col("l_extendedprice") * 100 % 2 != 0))
    merged = dict(even)
    for b, c in odd.items():
        merged[b] = merged.get(b, 0) + c
    assert merged == whole


def test_temperature_mixture_flattens_shares(spark, sf_dir):
    """tau=0.5 allocation sits between proportional and uniform: every
    selected count hits its target exactly, the budget is met modulo
    per-source rounding, and large sources get LESS than proportional
    share while small sources get MORE."""
    rows = QUERIES["pipeline_temperature_mixture"](spark, sf_dir).collect()
    assert all(r["n_selected"] == r["target"] for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    total_sel = sum(r["n_selected"] for r in rows)
    assert abs(total_sel - 200) <= len(rows)  # rounding per source
    biggest = max(rows, key=lambda r: r["n_docs"])
    smallest = min(rows, key=lambda r: r["n_docs"])
    if biggest["n_docs"] > smallest["n_docs"]:
        assert (
            biggest["target"] / total_sel
            < biggest["n_docs"] / total_docs + 1e-9
        )
        assert (
            smallest["target"] / total_sel
            > smallest["n_docs"] / total_docs - 1e-9
        )
