"""Corpus-operator scale demo: quality/dedup passes over N synthetic docs.

The driver testdata caps documents at 5k rows; this generates N documents
Spark-side (deterministic, ~55 tokens each from a 1k-word vocabulary with a
10% chance of carrying one of 50 boilerplate 6-token spans) and times the
round-3 corpus operators end-to-end:

- Gopher rule battery (scan-speed projection)
- repeated-span dedup stats (posexplode + window + agg)
- unigram-LM scoring (vocab fit + shuffle score join)
- BM25 top-10 (term-filtered explode)
- hash-embedding + SemDeDup keep-one (text→vector e2e)

Numbers land in SCALE.md §"Measured headroom".

Usage: python tools/corpus_scale_demo.py [n_docs]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.functions.vectors import lcg_planes
from kafka_avro_pipeline_java_spark.operators import quality, search, semdedup, spans
from kafka_avro_pipeline_java_spark.plans.text3 import hash_embedding
from kafka_avro_pipeline_java_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
TOKENS_PER_DOC = 55
VOCAB = 1000
N_SPANS = 50

spark = get_spark("corpus-scale-demo")
spark.sparkContext.setLogLevel("ERROR")

# Deterministic synthetic corpus, generated distributed. Each token is
# "w<h>" for a hash-uniform h in [0, VOCAB); ~10% of docs splice in one of
# N_SPANS fixed 6-token boilerplate spans so span-dedup has real work.
tok = lambda i, j: F.concat(
    F.lit("w"),
    F.pmod(F.xxhash64(F.concat_ws(":", i, j)), F.lit(VOCAB)).cast("string"),
)
body = F.concat_ws(
    " ",
    F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
        lambda j: tok(F.col("id"), j),
    ),
)
span_id = F.pmod(F.xxhash64(F.col("id") + 7), F.lit(N_SPANS))
boiler = F.concat_ws(
    " ",
    F.transform(
        F.sequence(F.lit(0), F.lit(5)), lambda j: tok(F.lit(99_000_000) + span_id, j)
    ),
)
docs = (
    spark.range(N)
    .repartition(64)
    .select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.xxhash64(F.col("id") + 13), F.lit(10)) == 0,
               F.concat_ws(" ", boiler, body))
        .otherwise(body)
        .alias("text"),
    )
)
docs.write.mode("overwrite").parquet("/tmp/corpus_scale_demo")
docs = spark.read.parquet("/tmp/corpus_scale_demo")
n = docs.count()

results = {"n_docs": n}


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 2)
    results[name] = {"sec": dt, "out": out, "docs_per_sec": round(n / dt)}
    print(f"{name}: {dt}s ({round(n/dt):,} docs/s) -> {out}")


timed("gopher_rules", lambda: quality.gopher_rules(docs, "text", "doc_id")
      .agg(F.sum("passes_gopher")).first()[0])
timed("span_dup_stats", lambda: spans.span_dup_stats(docs, "text", "doc_id", w=5)
      .filter("n_dup_spans > 0").count())
timed("unigram_logprob", lambda: quality.unigram_logprob(docs, "text", "doc_id")
      .agg(F.round(F.avg("mean_logprob"), 3)).first()[0])
timed("bm25_top10", lambda: search.bm25_topk(
    spark, docs, "text", "doc_id", ["w1", "w17", "w333", "w420", "w999"], k=10
).count())

# round-3 batch-2 operators over the same corpus
from kafka_avro_pipeline_java_spark.operators import bloom, bpe, fuzzy
from kafka_avro_pipeline_java_spark.functions import text as T

timed("fuzzy_edit_dedup", lambda: fuzzy.fuzzy_pairs(
    docs, "text", "doc_id", max_dist=20, prefix_tokens=2, max_block_size=100
).count())


def _entropy():
    counts = (
        docs.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    )
    from pyspark.sql.window import Window
    tot = F.sum("c").over(Window.partitionBy(F.lit(1)))
    pcol = F.col("c") / tot
    return round(counts.select((-pcol * F.log(pcol)).alias("plnp"))
                 .agg(F.sum("plnp")).first()[0], 3)


timed("token_entropy", _entropy)


def _bloom_decon():
    # 2^22-bit mask: the join form — a literal word array this size
    # defeats codegen (measured 126 s vs ~4 s at 200k docs)
    sp = spans.span_table(docs, "text", "doc_id", w=5).withColumnRenamed("id", "doc_id")
    is_eval = F.col("doc_id") % 97 == 0
    bench = sp.filter(is_eval).select("span_hash").distinct()
    words = bloom.bloom_words_df(bench, "span_hash", m_bits=1 << 22, k=3)
    cand = bloom.bloom_filter_members(
        sp.filter(~is_eval), "span_hash", words, m_bits=1 << 22, k=3
    )
    dirty = cand.join(F.broadcast(bench), "span_hash", "left_semi").select("doc_id").distinct()
    return docs.filter(~is_eval).join(F.broadcast(dirty), "doc_id", "left_anti").count()


timed("bloom_ngram_decontaminate", _bloom_decon)
timed("bpe_pair_stats_iter1", lambda: bpe.word_counts(docs, "text").count())

# SemDeDup pair volume is Σ cluster² ≈ n²/k when clusters are balanced;
# k ∝ √n keeps it ~n^1.5. Balance requires SIGNED embedding data: hashed
# bag-of-words count vectors live in the all-positive orthant, cosines
# concentrate near 1, and the argmax collapses onto a few giant clusters —
# pair volume degrades toward n² (observed: 30 cores pinned for >30 min at
# 50k docs). Real sentence embeddings are signed and spread; the demo uses
# signed hash-uniform vectors accordingly, and the text e2e variant stays a
# small-corpus oracle query (plans/text3.py) where the quadratic is
# harmless. For positive-orthant data, mean-center first or compose the
# LSH-band prefilter inside each cell (SCALE.md).
SEM_N = min(n, 100_000)
SEM_DIM = 32
SEM_K = max(16, int(SEM_N ** 0.5))
_CENTS = lcg_planes(SEM_K, SEM_DIM, seed=5)
emb = (
    spark.range(SEM_N)
    .repartition(64)
    .select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(SEM_DIM - 1)),
            lambda d: (
                F.pmod(F.xxhash64(F.concat_ws(":", F.col("id"), d)), F.lit(1 << 24))
                / F.lit(float(1 << 23))
                - 1.0
            ),
        ).alias("emb"),
    )
)
results["semdedup_n"] = SEM_N
results["semdedup_k"] = SEM_K
timed("semdedup_100k_vectors", lambda: semdedup.semantic_dedup(
    emb, "emb", "doc_id", _CENTS, 0.9
).count())

# round-4 operators ------------------------------------------------------

# int8 scalar quantization: encode pass + ADC top-10 over the same signed
# vectors (the training-free quantized read path; operators/pq.py::sq8_*)
from kafka_avro_pipeline_java_spark.operators.pq import sq8_adc_topk, sq8_encode
from kafka_avro_pipeline_java_spark.plans.text3 import hash_embedding_df

_sq_codes = sq8_encode(emb, "emb", "doc_id").localCheckpoint(eager=True)
_sq_q = emb.limit(1).select(F.col("emb").alias("q"))
timed("sq8_encode_pass", lambda: sq8_encode(emb, "emb", "doc_id").count())
# ADC over codes AT REST (the read path the row exists to demonstrate)
timed("sq8_adc_top10", lambda: sq8_adc_topk(_sq_codes, _sq_q, k=10).count())

# hash-embedding corpus pass in the exploded word-count shape (the round-4
# replacement for the interpreted histogram fold; plans/text3.py)
timed("hash_embedding_pass", lambda: hash_embedding_df(
    docs, "text", "doc_id"
).agg(F.sum(F.element_at("emb", 1))).first()[0])

# exact vs p=1/4 edge-leg-sampled triangle counting over a synthetic graph
# (V = n/5 nodes, ~2 planted K20 cliques per 100k nodes + random edges)
from kafka_avro_pipeline_java_spark.operators.graph import (
    triangle_count,
    triangle_count_sampled,
)

_V = max(1000, n // 5)
rand_e = (
    spark.range(10 * _V)
    .repartition(64)
    .select(
        F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(_V)).alias("id_a"),
        F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(_V)).alias("id_b"),
    )
)
clique_n = max(2, _V // 50_000)
clique = (
    spark.range(clique_n * 400)
    .select(
        (F.col("id") % clique_n).alias("c"),
        F.floor(F.col("id") / clique_n).alias("r"),
    )
    .select(
        "c",
        (F.col("r") % 20).alias("i"),
        F.floor(F.col("r") / 20).alias("j"),
    )
    .filter(F.col("i") < F.col("j"))
    .select(
        (F.lit(_V) + F.col("c") * 20 + F.col("i")).alias("id_a"),
        (F.lit(_V) + F.col("c") * 20 + F.col("j")).alias("id_b"),
    )
)
graph_pairs = (
    rand_e.filter(F.col("id_a") < F.col("id_b"))
    .unionByName(clique)
    .distinct()
    .localCheckpoint(eager=True)
)
results["triangle_graph_edges"] = graph_pairs.count()
timed("triangle_exact", lambda: triangle_count(graph_pairs).first()[0])
timed("triangle_sampled_p25", lambda: triangle_count_sampled(
    graph_pairs, inv_rate=4
).first().est_triangles)

print(json.dumps(results))
spark.stop()
