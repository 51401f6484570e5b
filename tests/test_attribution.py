"""Attribution plans (plans/attribution.py): Shapley lattice and the
quantized Markov absorption solve, pinned on hand-computable chains."""

from __future__ import annotations

import math

from kafka_avro_pipeline_java_spark.plans import QUERIES


def test_shapley_values_sum_to_v_grand_minus_v_empty(spark, sf_dir):
    """Efficiency axiom: Σφᵢ = v(full set) − v(∅) (within the 1e12
    quantization of the n·2^(n-1) lattice terms)."""
    df = QUERIES["events_attribution_shapley"](spark, sf_dir)
    rows = {r["channel"]: r["shapley_value"] for r in df.collect()}
    assert len(rows) == 4
    # recompute v(full) and v(empty) from the same user-mask construction
    from pyspark.sql import functions as F

    from kafka_avro_pipeline_java_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    chans = sorted(
        r["event_type"]
        for r in e.select("event_type").distinct().collect()
        if r["event_type"] != "purchase"
    )
    bit = F.lit(None).cast("int")
    for i, ch in enumerate(chans):
        bit = F.when(F.col("event_type") == ch, F.lit(1 << i)).otherwise(bit)
    usr = (
        e.select("user_id", bit.alias("b"),
                 F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("cv"))
        .groupBy("user_id")
        .agg(F.coalesce(F.expr("bit_or(b)"), F.lit(0)).alias("mask"),
             F.max("cv").alias("conv"))
    )
    stats = {r["mask"]: (r["cnt"], r["cv"]) for r in
             usr.groupBy("mask").agg(F.count("*").alias("cnt"),
                                     F.sum("conv").alias("cv")).collect()}
    full = (1 << len(chans)) - 1

    def v(mask):
        c = stats.get(mask)
        return c[1] / c[0] if c else 0.0

    assert math.isclose(
        sum(rows.values()), v(full) - v(0), abs_tol=1e-5
    )


def test_markov_removal_effects_are_sane(spark, sf_dir):
    df = QUERIES["events_attribution_markov_removal"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 4
    for r in rows:
        # removing a channel can only lose conversion mass
        assert 0.0 <= r["p_removed"] <= r["p_base"] <= 1.0
        assert 0.0 <= r["removal_effect"] <= 1.0
        assert math.isclose(
            r["removal_effect"],
            (r["p_base"] - r["p_removed"]) / r["p_base"],
            rel_tol=1e-9,
        )


def test_shapley_guards_against_channel_domain_drift(spark, tmp_path):
    """The Shapley oracle pins the n=4 channel lattice; a drifted
    event_type domain must fail LOUDLY in the Spark plan instead of
    silently hash-mismatching against the hardcoded oracle (r10 advice)."""
    import pytest

    rows = [
        (u, f"ch{u % 5}", u * 10 + k, u)  # 5 non-conversion channels
        for u in range(20)
        for k in range(2)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ts long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(ValueError, match="n=4 channel domain"):
        QUERIES["events_attribution_shapley"](spark, str(tmp_path)).collect()
