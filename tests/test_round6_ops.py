"""Round-6 operators: CDC apply-changes, containment pairs, RRF fusion,
Misra–Gries heavy hitters (zero-false-negative prefilter + exact 2nd pass).
"""

from collections import Counter

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.dedup import containment_pairs
from kafka_avro_pipeline_java_spark.operators.merge import cdc_apply
from kafka_avro_pipeline_java_spark.operators.search import rrf_fuse
from kafka_avro_pipeline_java_spark.operators.sketches import (
    heavy_hitters_exact,
    misra_gries_partition_summaries,
)

# ---------------------------------------------------------------- cdc_apply


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, seq int, op string, v string")


def test_cdc_latest_change_wins_and_deletes_drop(spark):
    log = _log(
        spark,
        [
            (1, 1, "I", "a"),
            (1, 2, "U", "a2"),  # winner for key 1
            (2, 1, "I", "b"),
            (2, 2, "D", None),  # key 2 deleted
            (3, 1, "I", "c"),  # untouched insert
        ],
    )
    out = {(r.k, r.seq, r.op, r.v) for r in
           cdc_apply(log, ["k"], seq_col="seq", op_col="op").collect()}
    assert out == {(1, 2, "U", "a2"), (3, 1, "I", "c")}


def test_cdc_out_of_order_log_same_result(spark):
    # the log arrives shuffled (Kafka partitions interleave); seq decides
    rows = [(1, 3, "U", "v3"), (1, 1, "I", "v1"), (1, 2, "U", "v2")]
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        out = cdc_apply(_log(spark, perm), ["k"], seq_col="seq", op_col="op")
        assert [(r.k, r.v) for r in out.collect()] == [(1, "v3")]


def test_cdc_reinsert_after_delete(spark):
    log = _log(spark, [(1, 1, "I", "a"), (1, 2, "D", None), (1, 3, "I", "a2")])
    out = cdc_apply(log, ["k"], seq_col="seq", op_col="op").collect()
    assert [(r.k, r.seq, r.v) for r in out] == [(1, 3, "a2")]


def test_cdc_plan_has_partial_aggregation(spark):
    # the max_by formulation must keep map-side combine: a partial + final
    # aggregate pair (struct-buffered max_by plans as SortAggregate), never
    # a Window sort over the full log
    log = _log(spark, [(1, 1, "I", "a")])
    plan = cdc_apply(log, ["k"], seq_col="seq", op_col="op")._jdf.queryExecution().executedPlan().toString()
    n_aggs = plan.count("SortAggregate") + plan.count("HashAggregate")
    assert n_aggs >= 2, plan
    assert "Window" not in plan


# ------------------------------------------------------- containment_pairs


def test_containment_is_asymmetric(spark):
    # short doc fully inside a long doc: containment(short→long) = 1.0,
    # while the reverse direction is far below threshold
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame([(1, short), (2, long)], "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, "text", "doc_id", k=3, threshold=0.9).collect()}
    assert out == {(1, 2): 1.0}


def test_containment_threshold_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y z q r s t u v")],
        "doc_id long, text string",
    )
    # doc 1 has 3 shingles (a b c, b c d, c d e); only "a b c" shared → 1/3
    out = containment_pairs(df, "text", "doc_id", k=3, threshold=0.5).collect()
    assert out == []
    out = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, "text", "doc_id", k=3, threshold=0.3).collect()}
    assert out[(1, 2)] == 0.3333


# ---------------------------------------------------------------- rrf_fuse


def test_rrf_scores_and_absent_rank_zero(spark):
    a = spark.createDataFrame([(10, 5.0), (20, 4.0)], "id long, s double")
    b = spark.createDataFrame([(20, 0.9), (30, 0.8)], "id long, s double")
    rows = {r.id: (r.rank_0, r.rank_1, r.rrf)
            for r in rrf_fuse([(a, "s"), (b, "s")], "id", c=60, k=10).collect()}
    assert rows[20] == (2, 1, round(1 / 62 + 1 / 61, 6))  # in both lists → top
    assert rows[10] == (1, 0, round(1 / 61, 6))
    assert rows[30] == (0, 2, round(1 / 62, 6))
    # doc in both lists outranks single-list docs at these ranks
    assert max(rows, key=lambda i: rows[i][2]) == 20


# ------------------------------------------------ Misra–Gries heavy hitters


def test_mg_partition_summaries_never_miss_local_heavy_hitter(spark):
    # 1 partition, n=100, k=10: any item with freq > 10 must survive
    items = ["hot"] * 30 + ["warm"] * 15 + [f"cold{i}" for i in range(55)]
    df = spark.createDataFrame([(x,) for x in items], "tok string").coalesce(1)
    kept = {r.tok for r in misra_gries_partition_summaries(df, "tok", k=10).collect()}
    assert {"hot", "warm"} <= kept
    assert len(kept) <= 10


def test_mg_summary_weight_lower_bound(spark):
    # MG weight ≥ true_freq − n/k for every surviving item
    items = ["a"] * 40 + ["b"] * 25 + [f"z{i % 20}" for i in range(35)]
    df = spark.createDataFrame([(x,) for x in items], "tok string").coalesce(1)
    true = Counter(items)
    n, k = len(items), 8
    for r in misra_gries_partition_summaries(df, "tok", k=k).collect():
        assert r.weight >= true[r.tok] - n / k
        assert r.weight <= true[r.tok]


def test_heavy_hitters_exact_matches_bruteforce_across_partitions(spark):
    items = (["x"] * 200 + ["y"] * 90 + ["w"] * 40
             + [f"t{i % 300}" for i in range(600)])
    df = spark.createDataFrame([(x,) for x in items], "tok string").repartition(7)
    k = 16
    got = {(r.tok, r.cnt) for r in heavy_hitters_exact(df, "tok", k=k).collect()}
    true = Counter(items)
    want = {(t, c) for t, c in true.items() if c > len(items) / k}
    assert got == want
    assert ("x", 200) in got


def test_heavy_hitters_null_items_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 9 + [(None,)] * 5 + [("b",)] * 1, "tok string"
    )
    got = {(r.tok, r.cnt) for r in heavy_hitters_exact(df, "tok", k=3).collect()}
    # n counts non-null items only (F.count(col)); a=9 > 10/3
    assert got == {("a", 9)}


# -------------------------------------------------------- kmv_set_ops


def test_kmv_setops_exact_below_k(spark):
    # two sets smaller than k: the sketch IS the set — estimates exact
    from kafka_avro_pipeline_java_spark.operators.sketches import kmv_set_ops

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, "g string, k long")
    [r] = kmv_set_ops(df, "g", "k", k=64).collect()
    assert (r.g_a, r.g_b) == ("a", "b")
    assert r.est_union == 50.0
    assert abs(r.est_jaccard - 10 / 50) < 1e-9
    assert abs(r.est_intersect - 10.0) < 1e-9


def test_kmv_setops_disjoint_sets(spark):
    from kafka_avro_pipeline_java_spark.operators.sketches import kmv_set_ops

    rows = [("a", i) for i in range(40)] + [("b", i + 1000) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, k long")
    [r] = kmv_set_ops(df, "g", "k", k=128).collect()
    assert r.est_jaccard == 0.0
    assert r.est_intersect == 0.0
    assert r.est_union == 80.0


def test_kmv_setops_estimate_error_above_k(spark):
    # 2000-element sets with 50% overlap, k=256: theta-sketch relative
    # error ~1/sqrt(k) ≈ 6%; assert a loose 3x bound
    from kafka_avro_pipeline_java_spark.operators.sketches import kmv_set_ops

    rows = [("a", i) for i in range(2000)] + [("b", i + 1000) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, k long")
    [r] = kmv_set_ops(df, "g", "k", k=256).collect()
    assert abs(r.est_union - 3000) / 3000 < 0.2
    assert abs(r.est_jaccard - 1000 / 3000) < 0.1
    assert abs(r.est_intersect - 1000) / 1000 < 0.35


# ----------------------------------------------- incremental_agg_apply


def _base_agg(spark, rows):
    return spark.createDataFrame(rows, "g string, cnt long, s double")


def test_incremental_agg_insert_update_delete(spark):
    from kafka_avro_pipeline_java_spark.operators.merge import (
        incremental_agg_apply,
    )

    base = _base_agg(spark, [("x", 2, 10.0), ("y", 1, 5.0)])
    delta = spark.createDataFrame(
        [
            ("x", 1, 4.0),    # insert into existing group
            ("y", -1, 5.0),   # delete the only y row → group drops
            ("z", 1, 7.0),    # brand-new group
        ],
        "g string, sign int, s double",
    )
    got = {
        r.g: (r.cnt, r.s)
        for r in incremental_agg_apply(
            base, delta, ["g"], count_col="cnt", sum_cols=["s"]
        ).collect()
    }
    assert got == {"x": (3, 14.0), "z": (1, 7.0)}


def test_incremental_agg_matches_direct_recompute(spark):
    import random

    from kafka_avro_pipeline_java_spark.operators.merge import (
        incremental_agg_apply,
    )
    from pyspark.sql import functions as SF

    rng = random.Random(7)
    facts = [(f"g{rng.randrange(5)}", float(rng.randrange(100)))
             for _ in range(300)]
    base_rows = facts[:200]
    inserts = facts[200:]
    deletes = base_rows[::7]
    fdf = spark.createDataFrame(base_rows, "g string, v double")
    base = fdf.groupBy("g").agg(
        SF.count("*").alias("cnt"), SF.sum("v").alias("v")
    )
    delta = spark.createDataFrame(
        [(g, 1, v) for g, v in inserts] + [(g, -1, v) for g, v in deletes],
        "g string, sign int, v double",
    )
    got = {
        r.g: (r.cnt, round(r.v, 6))
        for r in incremental_agg_apply(
            base, delta, ["g"], count_col="cnt", sum_cols=["v"]
        ).collect()
    }
    from collections import defaultdict

    remaining = list(base_rows)
    for d in deletes:
        remaining.remove(d)
    remaining += inserts
    want_cnt = Counter(g for g, _ in remaining)
    want_sum = defaultdict(float)
    for g, v in remaining:
        want_sum[g] += v
    want = {g: (want_cnt[g], round(want_sum[g], 6)) for g in want_cnt}
    assert got == want


# ------------------------------------------------------- golden record


def test_golden_record_survivorship_invariants(spark, sf_dir):
    """Every golden record: entity_id is the cluster min member id, the
    cluster has >= 2 members (components only contain paired docs), the
    survivor text length equals the longest member's, and the canonical
    lang/source are attribute values that actually occur in the cluster."""
    from kafka_avro_pipeline_java_spark.operators import dedup as dd
    from kafka_avro_pipeline_java_spark.plans import QUERIES
    from kafka_avro_pipeline_java_spark.sources import load_table

    out = {r["entity_id"]: r for r in
           QUERIES["dedup_golden_record"](spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.1)
    comp = dd.connected_components(pairs)
    members = {}
    for r in comp.join(d, comp["id"] == d["doc_id"]).collect():
        members.setdefault(r["component"], []).append(r)
    assert set(out) == set(members)
    for eid, rec in out.items():
        mem = members[eid]
        assert rec["n_members"] == len(mem) >= 2
        assert eid == min(m["doc_id"] for m in mem)
        assert rec["survivor_text_len"] == max(len(m["text"]) for m in mem)
        assert rec["canonical_lang"] in {m["lang"] for m in mem}
        assert rec["canonical_source"] in {m["source"] for m in mem}
        assert rec["total_chars"] == sum(m["n_chars"] for m in mem)
