"""Property-based tests for the sketch, fuzzy-dedup, and BPE operators:
invariants over ARBITRARY inputs (hypothesis drives the data, one Spark
job evaluates the whole batch — the test_corpus_properties.py pattern)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators import bpe, fuzzy, sketches

word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
doc = st.lists(word, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(word, min_size=1, max_size=40, unique=True))
def test_kmv_and_hll_are_multiset_invariant(spark, keys):
    # estimates are pure functions of the key SET: duplicating rows and
    # permuting order must not move them
    rows = [(k,) for k in keys]
    base = spark.createDataFrame(rows, "u string").select(
        F.lit("g").alias("g"), "u"
    )
    tripled = base.unionAll(base).unionAll(base)
    for fn in (sketches.kmv_distinct, sketches.hll_distinct):
        e1 = fn(base, "g", "u").collect()[0].est_distinct
        e2 = fn(tripled, "g", "u").collect()[0].est_distinct
        assert e1 == e2
    # below-k exactness for KMV
    if len(keys) < 64:
        assert (
            sketches.kmv_distinct(base, "g", "u", k=64).collect()[0].est_distinct
            == float(len(keys))
        )


@settings(max_examples=8, deadline=None)
@given(st.lists(doc, min_size=2, max_size=8, unique=True))
def test_fuzzy_pairs_agree_with_python_levenshtein(spark, docs):
    # every returned distance must equal the true edit distance, and every
    # same-block within-threshold pair must be returned
    def lev(a, b):
        # classic DP (small strings only)
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    k = 10
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    got = {
        (r.id_a, r.id_b): r.edit_dist
        for r in fuzzy.fuzzy_pairs(df, "text", "doc_id", max_dist=k).collect()
    }
    norm = [" ".join(d.lower().split()) for d in docs]
    blk = [" ".join(n.split()[:2]) for n in norm]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            d = lev(norm[i], norm[j])
            expected = blk[i] == blk[j] and d <= k
            if expected:
                assert got.get((i, j)) == d
            else:
                assert (i, j) not in got


@settings(max_examples=6, deadline=None)
@given(st.lists(doc, min_size=1, max_size=6))
def test_bpe_segmentation_always_reconstructs(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    merges = bpe.train_bpe(df, "text", n_merges=4)
    out = bpe.apply_bpe(df, "text", "doc_id", merges)
    got = {r.id: "".join(r.subwords).replace("</w>", " ").strip()
           for r in out.collect()}
    for i, d in enumerate(docs):
        assert got[i] == " ".join(d.lower().split())
