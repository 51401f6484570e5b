"""Bloom prefilter (operators/bloom.py): zero false negatives, bounded
false-positive rate, and codegen-only probe plan."""

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators import bloom


def test_bloom_no_false_negatives(spark):
    members = spark.range(300).select(F.concat(F.lit("key-"), "id").alias("v"))
    mask = bloom.bloom_build(members, "v", m_bits=1 << 13, k=3)
    hits = members.filter(bloom.bloom_test(F.col("v"), mask, k=3)).count()
    assert hits == 300  # every true member MUST pass


def test_bloom_false_positive_rate_bounded(spark):
    members = spark.range(300).select(F.concat(F.lit("key-"), "id").alias("v"))
    mask = bloom.bloom_build(members, "v", m_bits=1 << 13, k=3)
    others = spark.range(5000).select(F.concat(F.lit("other-"), "id").alias("v"))
    fp = others.filter(bloom.bloom_test(F.col("v"), mask, k=3)).count()
    # theoretical FP ≈ (1 - e^{-3*300/8192})^3 ≈ 1.1e-3; allow 10x slack
    assert fp <= 55


def test_bloom_probe_is_joinless(spark):
    members = spark.range(50).select(F.col("id").cast("string").alias("v"))
    mask = bloom.bloom_build(members, "v", m_bits=1 << 13, k=3)
    probe = spark.range(100).select(F.col("id").cast("string").alias("v")).filter(
        bloom.bloom_test(F.col("v"), mask, k=3)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_prefilter_preserves_exact_decontamination(spark, sf_dir):
    # bloom path == plain broadcast-set path, row for row
    from kafka_avro_pipeline_java_spark.plans import QUERIES

    got = {
        r.doc_id
        for r in QUERIES["pipeline_decontaminate_bloom"](spark, sf_dir).collect()
    }
    from kafka_avro_pipeline_java_spark.operators import spans as sp_mod
    from kafka_avro_pipeline_java_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    flagged = sp_mod.ngram_decontaminate(
        d, "text", "doc_id", F.col("doc_id") % 97 == 0, w=5
    )
    dirty = {r.id for r in flagged.collect()}
    clean = {
        r.doc_id for r in d.filter(F.col("doc_id") % 97 != 0).select("doc_id").collect()
    } - dirty
    assert got == clean


def test_bloom_join_form_matches_literal_form(spark):
    members = spark.range(400).select(F.concat(F.lit("m-"), "id").alias("v"))
    probe = spark.range(3000).select(F.concat(F.lit("m-"), "id").alias("v"))
    # literal form
    mask = bloom.bloom_build(members, "v", m_bits=1 << 13, k=3)
    lit_hits = {
        r.v for r in probe.filter(bloom.bloom_test(F.col("v"), mask, k=3)).collect()
    }
    # join form over the same bit positions
    words = bloom.bloom_words_df(members, "v", m_bits=1 << 13, k=3)
    join_hits = {
        r.v
        for r in bloom.bloom_filter_members(
            probe, "v", words, m_bits=1 << 13, k=3
        ).collect()
    }
    assert join_hits == lit_hits
    assert {f"m-{i}" for i in range(400)} <= join_hits  # no false negatives
