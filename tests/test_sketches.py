"""Sketch operators (operators/sketches.py): estimator accuracy and the
Count-Min overestimate-only guarantee."""

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators import sketches


def test_kmv_estimate_within_theory_bound(spark):
    # 4000 distinct keys, k=64 → σ ≈ 1/√k ≈ 12.5%; assert within 3σ
    df = spark.range(4000).select(
        F.lit("grp").alias("g"), F.concat(F.lit("user-"), "id").alias("u")
    )
    out = sketches.kmv_distinct(df, "g", "u", k=64).collect()[0]
    assert abs(out.est_distinct - 4000) / 4000 < 0.375


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("small").alias("g"), F.col("id").alias("u")
    )
    out = sketches.kmv_distinct(df, "g", "u", k=64).collect()[0]
    assert out.est_distinct == 40.0  # sketch IS the set below k


def test_countmin_never_underestimates(spark):
    # zipf-ish stream: token i appears (100 - i) times
    rows = [(f"tok{i}",) for i in range(100) for _ in range(100 - i)]
    items = spark.createDataFrame(rows, "tok string")
    true = items.groupBy("tok").agg(F.count("*").alias("t"))
    est = sketches.countmin_estimate(
        items, "tok", true.select("tok"), "tok", depth=3, width=256
    )
    joined = true.join(est, true.tok == est.probe).select("t", "est_count")
    bad = joined.filter(F.col("est_count") < F.col("t")).count()
    assert bad == 0
    # with 100 tokens in 256 cols ×3 rows, most probes should be exact
    exact = joined.filter(F.col("est_count") == F.col("t")).count()
    assert exact >= 80


def test_countmin_absent_probe_reports_zero(spark):
    # a probe never seen in the stream must report est_count 0 (its empty
    # cells win the min via the left join + coalesce), not vanish from the
    # output or overestimate from only its occupied cells
    items = spark.createDataFrame([("a",), ("a",), ("b",)], "tok string")
    probes = spark.createDataFrame(
        [("a",), ("never-seen-1",), ("never-seen-2",)], "tok string"
    )
    out = {
        r.probe: r.est_count
        for r in sketches.countmin_estimate(
            items, "tok", probes, "tok", depth=3, width=1024
        ).collect()
    }
    assert set(out) == {"a", "never-seen-1", "never-seen-2"}
    assert out["a"] >= 2
    # 3 items into 3×1024 cells: astronomically unlikely all 3 of a probe's
    # cells collide, and min() needs only ONE empty cell to return 0
    assert out["never-seen-1"] == 0
    assert out["never-seen-2"] == 0


def test_hll_estimate_within_theory_bound(spark):
    # m=64 → σ ≈ 1.04/√64 = 13%; assert within 3σ on 4000 distinct
    df = spark.range(4000).select(
        F.lit("grp").alias("g"), F.concat(F.lit("user-"), "id").alias("u")
    )
    out = sketches.hll_distinct(df, "g", "u", m=64).collect()[0]
    assert abs(out.est_distinct - 4000) / 4000 < 0.39


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.range(500).select(
        F.lit("g").alias("g"), F.concat(F.lit("k-"), "id").alias("u")
    )
    dup = base.unionAll(base).unionAll(base)
    e1 = sketches.hll_distinct(base, "g", "u").collect()[0].est_distinct
    e3 = sketches.hll_distinct(dup, "g", "u").collect()[0].est_distinct
    assert e1 == e3  # register max is insensitive to multiplicity


def test_countmin_weighted_cells_match_raw_stream(spark):
    """r14: a sketch built from the pre-aggregated (item, count) table
    with weight_col must be CELL-IDENTICAL to one built from the raw
    stream — integer regrouping, the property the one-tokenize countmin
    plans rely on."""
    from pyspark.sql import functions as F

    from kafka_avro_pipeline_java_spark.operators import sketches

    raw = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "tok string"
    )
    counts = raw.groupBy("tok").agg(F.count("*").alias("n"))
    cells_raw = {
        (r["row"], r["col"]): r["c"]
        for r in sketches.countmin_cells(raw, "tok", depth=3, width=64).collect()
    }
    cells_w = {
        (r["row"], r["col"]): r["c"]
        for r in sketches.countmin_cells(
            counts, "tok", depth=3, width=64, weight_col="n"
        ).collect()
    }
    assert cells_raw == cells_w
