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


def test_fuzzy_graded_cap_bounds_planted_200_doc_block(spark):
    # the graded queries' guard (max_block_size=100, mirrored in their
    # DuckDB oracles): a planted 200-doc shared-opening block would emit
    # 200*199/2 = 19900 candidates uncapped; with the cap the heavy block
    # is dropped wholesale, so surviving candidates stay <= K^2 (here: 1
    # pair from the small block) and no boilerplate id ever appears.
    rows = [(i, f"shared opening filler word{i} tail") for i in range(200)]
    rows += [(1000, "small block identical body"),
             (1001, "small block identical body x")]
    df = _docs(spark, rows)
    out = fuzzy_pairs(df, "text", "doc_id", max_dist=20, max_block_size=100)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1000, 1001)}
    assert len(got) <= 100 * 100


def test_jaro_winkler_batch_matches_scalar_and_duckdb():
    # the vectorization gate: the numpy batch kernel must be bit-identical
    # to the scalar reference kernel, and both must match DuckDB's
    # jaro_winkler_similarity (8k random pairs incl. forced shared
    # prefixes, empties, equal strings, and length skew).
    import random
    import duckdb
    import numpy as np
    from kafka_avro_pipeline_java_spark.operators.fuzzy import (
        jaro_winkler, jaro_winkler_batch,
    )

    rng = random.Random(42)
    alpha = "abcdefgh "
    pairs = []
    for _ in range(4000):
        n1 = rng.randint(0, 20)
        n2 = rng.randint(0, 20)
        a = "".join(rng.choice(alpha) for _ in range(n1))
        b = "".join(rng.choice(alpha) for _ in range(n2))
        pairs.append((a, b))
        # forced shared prefix (the Winkler branch) + occasional equality
        p = a[: rng.randint(0, 4)]
        pairs.append((p + a, p + b if rng.random() < 0.9 else p + a))
    left = [p[0] for p in pairs]
    right = [p[1] for p in pairs]
    got = jaro_winkler_batch(left, right)
    scalar = np.array([jaro_winkler(a, b) for a, b in pairs])
    assert np.array_equal(got, scalar), "batch kernel != scalar kernel"
    con = duckdb.connect()
    duck = np.array([
        con.execute(
            "SELECT CASE WHEN len(?)=0 OR len(?)=0 THEN 0.0 "
            "ELSE jaro_winkler_similarity(?, ?) END", [a, b, a, b]
        ).fetchone()[0]
        for a, b in pairs[:800]
    ])
    assert np.allclose(got[:800], duck, rtol=0, atol=1e-12), "!= DuckDB"


def test_jaro_winkler_batch_handles_none_and_unicode():
    import numpy as np
    from kafka_avro_pipeline_java_spark.operators.fuzzy import (
        jaro_winkler, jaro_winkler_batch,
    )
    left = [None, "abc", None, "héllo wörld", "ab"]
    right = ["abc", None, None, "hallo world", "ab"]
    got = jaro_winkler_batch(left, right)
    assert got[0] == got[1] == got[2] == 0.0
    assert got[3] == jaro_winkler("héllo wörld", "hallo world")
    assert got[4] == 1.0
    assert got.dtype == np.float64
