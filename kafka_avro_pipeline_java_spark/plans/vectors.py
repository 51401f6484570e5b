"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import lcg_planes
from ..operators import dedup, similarity
from ..sources import load_table
from .registry import query


@query(
    "knn_cosine_bruteforce",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS dp,
             SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)) AS na,
             SUM(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS nb
      FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS i(i)
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, ROUND(dp / (SQRT(na) * SQRT(nb)), 6) AS cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 to the vec_id=0 embedding. Query vector is read
    from the table itself (1-row broadcast), so the plan is fully
    distributed — no driver-side vector math."""
    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q")))
    from ..functions.vectors import cosine_similarity

    return (
        e.crossJoin(q)
        .select(
            "vec_id",
            "label",
            F.round(cosine_similarity(F.col("embedding"), F.col("q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH ex AS (SELECT vec_id, embedding FROM embeddings),
    norms AS (
      SELECT vec_id,
             SQRT(SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE))) AS nrm
      FROM ex, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)) AS dp
      FROM ex a JOIN ex b ON a.vec_id < b.vec_id,
           UNNEST(range(1, len(a.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    )
    SELECT d.id_a, d.id_b, ROUND(d.dp / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM dots d
    JOIN norms na ON na.vec_id = d.id_a
    JOIN norms nb ON nb.vec_id = d.id_b
    WHERE ROUND(d.dp / (na.nrm * nb.nrm), 6) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs. Threshold 0.4 (not the production
    0.9+): the test embeddings are uniform-random with max pairwise cosine
    ~0.51, so 0.4 is what exercises a NON-EMPTY result (59 pairs at sf0.01)
    through the whole pair-join + verify path."""
    e = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_near_pairs(e, "embedding", "vec_id", threshold=0.4)


@query(
    "knn_all_pairs_top3",
    oracle="""
    WITH ex AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
    norms AS (
      SELECT vec_id,
             SQRT(SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE))) AS nrm
      FROM ex, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)) AS dp
      FROM ex a JOIN ex b ON a.vec_id <> b.vec_id,
           UNNEST(range(1, len(a.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    ), scored AS (
      SELECT d.id_a AS vec_id, d.id_b AS neighbor_id,
             ROUND(d.dp / (na.nrm * nb.nrm), 6) AS cos_sim
      FROM dots d
      JOIN norms na ON na.vec_id = d.id_a
      JOIN norms nb ON nb.vec_id = d.id_b
    )
    SELECT vec_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def knn_all_pairs_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN: 3 nearest neighbors for EVERY vector (restricted to
    vec_id<200 to bound the oracle's n² work). Exact pair scoring +
    per-vector top-k window; the 100 TB path runs the same final window
    over IVF/LSH candidate pairs instead of all pairs."""
    from pyspark.sql.window import Window

    from ..functions.vectors import dot, norm

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    base = e.select("vec_id", F.col("embedding").alias("v"), norm("embedding").alias("nrm"))
    a = base.alias("a")
    b = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    ).alias("b")
    scored = (
        a.join(b, F.col("a.vec_id") != F.col("b.neighbor_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            "neighbor_id",
            F.round(
                dot(F.col("a.v"), F.col("bv")) / (F.col("a.nrm") * F.col("bnrm")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Bucketed embedding near-dup: the 100 TB path for dedup_embedding_cosine.
# The hyperplanes are deterministic literals (LCG), so the ENTIRE pipeline —
# signature, banding, candidate equi-join, cosine verify — is expressible in
# DuckDB SQL and fully oracle-checked, not just recall-tested.
# --------------------------------------------------------------------------
_EMB_DIM = 64          # driver test embeddings (TESTDATA.md)
_EMB_PLANES = lcg_planes(8, _EMB_DIM, seed=42)
_EMB_BANDS = 2


def _sig_banded_ctes(planes: list[list[float]], bands: int) -> str:
    """Shared oracle fragment: per-vector hyperplane-sign signature + band
    buckets, computed from the same literal plane values the Spark plan
    embeds (so both engines derive identical buckets)."""
    bits = len(planes)
    per_band = bits // bands
    mask = (1 << per_band) - 1
    dot_cols = ",\n             ".join(
        f"SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(([{', '.join(repr(x) for x in p)}])[i.i] AS DOUBLE)) AS d{j}"
        for j, p in enumerate(planes)
    )
    sig_sum = " + ".join(
        f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, sig, nrm, {b} AS band, (sig // {1 << (b * per_band)}) % {mask + 1} AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""ex AS (SELECT vec_id, embedding FROM embeddings),
    dots AS (
      SELECT vec_id,
             {dot_cols},
             SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE)) AS nsq
      FROM ex, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), sig AS (
      SELECT vec_id, SQRT(nsq) AS nrm, {sig_sum} AS sig FROM dots
    ), banded AS (
{band_selects}
    )"""


def _bucketed_embedding_oracle(planes: list[list[float]], bands: int,
                               threshold: float) -> str:
    return f"""
    WITH {_sig_banded_ctes(planes, bands)}, cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ), pair_dots AS (
      SELECT c.id_a, c.id_b,
             SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)) AS dp
      FROM cand c
      JOIN ex a ON a.vec_id = c.id_a
      JOIN ex b ON b.vec_id = c.id_b,
           UNNEST(range(1, len(a.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b, ROUND(p.dp / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM pair_dots p
    JOIN sig na ON na.vec_id = p.id_a
    JOIN sig nb ON nb.vec_id = p.id_b
    WHERE ROUND(p.dp / (na.nrm * nb.nrm), 6) >= {threshold}
    """


def _bucketed_topk_oracle(planes: list[list[float]], bands: int, k: int) -> str:
    return f"""
    WITH {_sig_banded_ctes(planes, bands)}, cand AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
      GROUP BY 1, 2
    ), pair_dots AS (
      SELECT c.vec_id, c.neighbor_id,
             SUM(CAST(a.embedding[i.i] AS DOUBLE) * CAST(b.embedding[i.i] AS DOUBLE)) AS dp
      FROM cand c
      JOIN ex a ON a.vec_id = c.vec_id
      JOIN ex b ON b.vec_id = c.neighbor_id,
           UNNEST(range(1, len(a.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    ), scored AS (
      SELECT p.vec_id, p.neighbor_id,
             ROUND(p.dp / (na.nrm * nb.nrm), 6) AS cos_sim
      FROM pair_dots p
      JOIN sig na ON na.vec_id = p.vec_id
      JOIN sig nb ON nb.vec_id = p.neighbor_id
    )
    SELECT vec_id, neighbor_id, cos_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


@query(
    "dedup_embedding_bucketed",
    oracle=_bucketed_embedding_oracle(_EMB_PLANES, _EMB_BANDS, 0.4),
)
def dedup_embedding_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the LSH-bucket prefilter (8 hyperplane
    signs, 2 bands of 4 bits) + exact cosine verify — the scale path whose
    candidate join is Σ bucket² instead of n². Value-checked against a
    DuckDB oracle computing the identical signatures from the same literal
    hyperplanes. Threshold 0.4 mirrors dedup_embedding_cosine (the test
    embeddings have no pairs above ~0.51); at the production near-dup
    regime (cos ≥ 0.9, θ ≤ 26°) the 4-bit-band collision probability is
    ~0.95+ — recall is measured on clustered data in
    tests/test_similarity.py and SCALE.md."""
    e = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_near_pairs_bucketed(
        e, "embedding", "vec_id", _EMB_PLANES, threshold=0.4, bands=_EMB_BANDS
    )


@query(
    "knn_topk_bucketed",
    oracle=_bucketed_topk_oracle(_EMB_PLANES, _EMB_BANDS, 3),
)
def knn_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch approximate kNN over ALL vectors: the scale path for
    knn_all_pairs_top3 — the same per-vector top-k window, but run over
    LSH band-bucket candidate pairs (Σ bucket² join) instead of the O(n²)
    self-join. Deterministic literal hyperplanes make the whole pipeline
    DuckDB-expressible, so candidates AND scores are oracle-checked
    value-for-value; recall vs the exact window is measured in
    tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.bucketed_topk_neighbors(
        spark, e, "embedding", "vec_id", _EMB_PLANES, k=3, bands=_EMB_BANDS
    )


# Approximate ANN paths (LSH buckets / IVF probes) use engine-internal
# sampling and hyperplanes — rows-only driver check; recall floors vs the
# brute-force path are asserted in tests/test_similarity.py.
@query("knn_cosine_lsh")
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    # 5 planes + Hamming-2 multiprobe measures ~0.8 recall at ~50% candidate
    # fraction on these (uniform-random, worst-case-for-LSH) embeddings;
    # clustered real-world embeddings support more planes / fewer probes.
    planes = lcg_planes(5, len(qv), seed=42)
    return similarity.lsh_bucketed_knn(spark, e, "embedding", "vec_id", qv, planes, k=5)


@query("knn_cosine_ivf")
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_knn(spark, e, "embedding", "vec_id", qv, n_centroids=16,
                              n_probe=4, k=5)


@query("knn_cosine_ivf_trained")
def knn_cosine_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with k-means-trained centroids (operators/clustering.py): Lloyd's
    iterations whose assignment step is the same zero-shuffle codegen argmax
    the index probe uses, and whose update shuffles only k×(dim+2)
    aggregated values per round. Rows-only driver check; recall vs brute
    force and inertia monotonicity are asserted in
    tests/test_similarity.py."""
    from ..operators.clustering import train_kmeans

    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents, _ = train_kmeans(e, "embedding", k=16, max_iters=5, seed=42)
    return similarity.ivf_knn(spark, e, "embedding", "vec_id", qv,
                              n_probe=4, k=5, centroids=cents)


@query("knn_cosine_ivf_pq")
def knn_cosine_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete billion-scale ANN read path (operators/pq.py): k-means
    coarse cells + product-quantized codes scored by ADC lookup tables +
    exact re-rank of the ADC shortlist — probe filter, m table lookups per
    surviving row, broadcast of ~50 shortlist ids for the re-rank; the
    corpus never shuffles. Rows-only driver check; ADC-vs-exact recall
    floors and code determinism are asserted in tests/test_similarity.py."""
    from ..operators.clustering import train_kmeans
    from ..operators.pq import ivf_pq_topk, train_pq

    e = load_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents, _ = train_kmeans(e, "embedding", k=16, max_iters=5, seed=42)
    books = train_pq(e, "embedding", m=8, ksub=16, seed=42)
    return ivf_pq_topk(spark, e, "embedding", "vec_id", qv, cents, books,
                       n_probe=4, k=5, rerank=50)
