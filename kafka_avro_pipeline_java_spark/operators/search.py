"""Keyword retrieval over the document corpus: BM25 top-k.

The retrieval primitive a training-data pipeline needs for corpus QA,
targeted decontamination, and building retrieval baselines. Okapi BM25 with
the Lucene idf formulation:

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d, q) = sum_t idf(t) * tf_td * (k1 + 1)
                  / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Plan shape (and why it scales):
- The token stream is filtered to the query's terms BEFORE any shuffle —
  for a q-term query the exploded stream shrinks to roughly q * df rows, so
  the per-(doc, term) count aggregates a tiny fraction of the corpus.
- Document frequencies and corpus stats (N, avgdl) are aggregates over that
  same stream / the doc-length projection; both results are a handful of
  rows and join back as broadcasts — the corpus-sized side never shuffles
  for them. NOTE the bound: ``dfreq`` is grouped from the term-FILTERED hit
  stream, so it has at most |query terms| rows — it is NOT the full-vocab
  document-frequency table (that would be 10⁸+ rows at 100 TB and must
  never be broadcast; quality.py's idf path hash-partitions for exactly
  that reason). The broadcast here is bounded by the query, not the corpus.
- Per-doc score sum is one keyed aggregation; top-k is TakeOrdered
  (per-partition heap + k-row driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T


def bm25_topk(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for the bag-of-words query ``terms``.

    Output: (id, n_hit_terms, bm25 rounded to 4) ordered by (bm25 desc, id)
    with the id tiebreak making the selected row set deterministic."""
    terms = [t.lower() for t in terms]
    docs = df.select(
        F.col(id_col).alias("id"),
        T.tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    # Doc length rides WITH the hit stream (constant per doc, folded back
    # out with max() in the tf aggregate) — the alternative, a separate
    # per-doc length table joined to tf, is a corpus-sized join at scale.
    hits = docs.select(
        "id",
        F.size("toks").cast("double").alias("dl"),
        F.explode(
            F.filter("toks", lambda t: t.isin(*terms))
        ).alias("tok"),
    )
    # r14: tf fed both the document-frequency rollup and the scoring join
    # — two full corpus tokenize passes. The table is (hit-doc × term)-
    # scale after the term filter; materialize it once (§2.4).
    tf = hits.groupBy("id", "tok").agg(
        F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df_t"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("toks").cast("double")).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_hit_terms"),
            F.round(F.sum("term_score"), 4).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("id"))
        .limit(k)
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    id_col: str = "id",
    *,
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists (Cormack et al.,
    SIGIR'09): score(d) = Σ_lists 1 / (c + rank_list(d)), documents absent
    from a list contribute nothing for it.

    ``ranked``: [(df, score_col)] where each df is a TOP-K LIST already —
    bounded rows, deterministic order by (score_col desc, id). That bound
    is the scale contract: each retrieval branch (BM25 inverted-index agg,
    ANN bucket probe) does the distributed work and emits k rows, so the
    fusion itself is a driver-trivial full-outer join of k-row inputs —
    single partition, no shuffle that matters. rank_i columns come out
    1-based; 0 marks "not retrieved by this branch".
    """
    fused = None
    for i, (df, score_col) in enumerate(ranked):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        r = df.select(
            id_col, F.row_number().over(w).alias(f"rank_{i}")
        )
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    score = sum(
        (
            F.when(F.col(f"rank_{i}").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col(f"rank_{i}")))
            .otherwise(F.lit(0.0))
            for i in range(len(ranked))
        ),
        F.lit(0.0),
    )
    ranks = [
        F.coalesce(F.col(f"rank_{i}"), F.lit(0)).cast("int").alias(f"rank_{i}")
        for i in range(len(ranked))
    ]
    return (
        fused.select(id_col, *ranks, F.round(score, 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )
