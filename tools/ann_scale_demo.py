"""ANN-at-scale demo: PQ encode + ADC query over 1M synthetic vectors.

The driver testdata caps embeddings at 2k rows, which exercises
correctness but not the scale story. This script generates N
deterministic 64-dim vectors Spark-side (no driver data path), trains PQ
codebooks on a bounded sample, encodes the full corpus, and times the
two read paths (ADC top-k over codes vs brute-force cosine over raw
vectors). Numbers land in SCALE.md §"Measured headroom".

Usage: python tools/ann_scale_demo.py [n_rows]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq,
)
from kafka_avro_pipeline_java_spark.functions.vectors import lcg_planes
from kafka_avro_pipeline_java_spark.operators.similarity import brute_force_knn
from kafka_avro_pipeline_java_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64

spark = get_spark("ann-scale-demo")
spark.sparkContext.setLogLevel("ERROR")

# Deterministic synthetic corpus, generated distributed (hash-uniform in
# [-1, 1) per (row, dim) — no RNG state, no driver data path).
emb = (
    spark.range(N)
    .repartition(64)
    .select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.pmod(
                    F.xxhash64(F.concat_ws(":", F.col("id"), d)), F.lit(1 << 24)
                )
                / F.lit(float(1 << 23))
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )
)
emb.write.mode("overwrite").parquet("/root/repo/.scratch/ann_demo_embeddings")
corpus = spark.read.parquet("/root/repo/.scratch/ann_demo_embeddings")
print(f"corpus: {corpus.count()} rows x {DIM} dims", flush=True)

t0 = time.perf_counter()
books = train_pq(corpus, "embedding", m=16, ksub=16, sample_size=10_000)
t_train = time.perf_counter() - t0
print(f"train_pq (10k sample, driver numpy): {t_train:.1f}s", flush=True)

t0 = time.perf_counter()
codes = pq_encode(corpus, "embedding", "vec_id", books)
codes.write.mode("overwrite").parquet("/root/repo/.scratch/ann_demo_codes")
t_enc = time.perf_counter() - t0
print(f"pq_encode {N} rows: {t_enc:.1f}s = {N / t_enc:,.0f} rows/s", flush=True)

codes_tbl = spark.read.parquet("/root/repo/.scratch/ann_demo_codes")
qv = lcg_planes(1, DIM, seed=4242)[0]

t0 = time.perf_counter()
top_adc = pq_adc_topk(codes_tbl, qv, books, k=10).collect()
t_adc = time.perf_counter() - t0
print(f"ADC top-10 over codes: {t_adc:.2f}s", flush=True)

t0 = time.perf_counter()
top_exact = brute_force_knn(spark, corpus, "embedding", "vec_id", qv, k=10).collect()
t_bf = time.perf_counter() - t0
print(f"brute-force cosine top-10 over raw vectors: {t_bf:.2f}s", flush=True)

adc_ids = {r["vec_id"] for r in top_adc}
exact_ids = {r["vec_id"] for r in top_exact}
print(f"ADC@10 vs exact@10 overlap: {len(adc_ids & exact_ids)}/10", flush=True)

# Two-stage read path: ADC shortlist over codes, exact rerank on the
# shortlist only — the production retrieval shape.
from kafka_avro_pipeline_java_spark.operators.pq import pq_rerank_topk

for shortlist in (1000, 5000):
    t0 = time.perf_counter()
    got = {
        r["vec_id"]
        for r in pq_rerank_topk(
            spark, corpus, codes_tbl, "embedding", "vec_id", qv, books,
            k=10, shortlist=shortlist,
        ).collect()
    }
    print(
        f"rerank shortlist={shortlist} ({shortlist / N:.2%} of corpus): "
        f"overlap {len(got & exact_ids)}/10 in {time.perf_counter() - t0:.2f}s",
        flush=True,
    )
spark.stop()
