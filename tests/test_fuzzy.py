"""Edit-distance dedup (operators/fuzzy.py): planted-duplicate recovery,
threshold edge behavior, blocking semantics, and plan shape."""

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.fuzzy import fuzzy_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fuzzy_finds_planted_mutation(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base.replace("delta", "delpa")),      # 1 substitution, same prefix
        (3, "totally different words here now"),
        (4, base.replace("epsilon zeta", "")),    # deletion within bound
    ]
    out = fuzzy_pairs(_docs(spark, rows), "text", "doc_id", max_dist=20)
    pairs = {(r.id_a, r.id_b): r.edit_dist for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1
    assert (1, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_fuzzy_threshold_is_exact_boundary(spark):
    # distance exactly max_dist is kept; max_dist+1 is dropped
    a = "prefix token " + "x" * 30
    b = "prefix token " + "y" * 30          # dist 30 (substitutions)
    c = "prefix token " + "x" * 29 + "y"    # dist 1 from a
    rows = [(1, a), (2, b), (3, c)]
    out = fuzzy_pairs(_docs(spark, rows), "text", "doc_id", max_dist=30)
    got = {(r.id_a, r.id_b): r.edit_dist for r in out.collect()}
    assert got[(1, 2)] == 30
    assert got[(1, 3)] == 1
    out2 = fuzzy_pairs(_docs(spark, rows), "text", "doc_id", max_dist=29)
    got2 = {(r.id_a, r.id_b) for r in out2.collect()}
    assert (1, 2) not in got2 and (1, 3) in got2


def test_fuzzy_blocking_is_prefix_scoped(spark):
    # identical tail but mutated first token -> different block -> no pair
    # (documented recall tradeoff; complementary shingle blocks catch these)
    rows = [
        (1, "alpha beta common tail of this document body"),
        (2, "ALPHA beta common tail of this document body"),  # case-normalized: same block
        (3, "omega beta common tail of this document body"),  # head mutation: missed
    ]
    out = fuzzy_pairs(_docs(spark, rows), "text", "doc_id", max_dist=10)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2)}


def test_fuzzy_length_prefilter_prunes_before_verify(spark):
    # |len(a)-len(b)| > k pairs never reach levenshtein; also asserts the
    # plan has exactly one join and no cartesian product
    rows = [(1, "tok tok " + "a" * 10), (2, "tok tok " + "a" * 100)]
    df = fuzzy_pairs(_docs(spark, rows), "text", "doc_id", max_dist=5)
    assert df.count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_fuzzy_block_cap_drops_heavy_blocks_only(spark):
    # 30 docs share a boilerplate opening (d^2 = 870 ordered pairs); two
    # docs in a rare block are near-identical. Capping at 10 must drop
    # every boilerplate pair and keep the rare-block pair.
    rows = [(i, f"common opening body word{i}") for i in range(30)]
    rows += [(100, "rare opener tail one"), (101, "rare opener tail two")]
    df = _docs(spark, rows)
    capped = fuzzy_pairs(df, "text", "doc_id", max_dist=10, max_block_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}
    uncapped = fuzzy_pairs(df, "text", "doc_id", max_dist=10)
    assert uncapped.count() > 100  # the boilerplate pairs exist without the cap
