"""SemDeDup: semantic deduplication via cluster-then-compare.

The embedding-space dedup recipe of Abbas et al. 2023 ("SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"): k-means
the embeddings, compare pairs ONLY within a cluster, and keep one document
per near-duplicate set. Clustering turns the O(n²) pair space into
Σ cluster² — with k ∝ √n clusters the candidate volume is ~n·(n/k), and
every comparison is an equi-join on the cluster id.

Plan shape here:
- assignment: the zero-shuffle literal-centroid argmax projection shared
  with IVF (operators/clustering.py::with_centroid_assignment) — centroids
  come from operators/clustering.train_kmeans (or any literal list);
- candidate pairs: a self-equi-join on the cluster id with the row norm
  materialized per side, cosine computed inside the join projection;
- keep-one: survivors = anti-join against the doomed set (any vector with
  a smaller-id near-duplicate in its cluster), the same deterministic
  min-id rule as operators/dedup.keep_one.

At 100 TB: k is sized so clusters bound pair volume (k ~ 10⁵ for 10¹⁰
docs); the cluster-id join key is low-cardinality-by-design, so the pair
stage relies on AQE skew-split (or pre-salting by a secondary LSH band, as
in operators/dedup.bucketed_embedding_pairs) for giant clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot
from .clustering import with_centroid_assignment


def _assigned_side(
    df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]
) -> DataFrame:
    """(id, v, cid, nrm) behind a repartition exchange. The exchange sits
    UPSTREAM of the k×dim argmax so a small/single-file source doesn't
    evaluate every assignment in one scan task, and it is REUSED by every
    consumer (both pair-join sides + the survivor projection), so the
    argmax is computed once
    (see operators/dedup.py::embedding_near_pairs_bucketed)."""
    from ..functions.vectors import norm

    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    assigned = with_centroid_assignment(spread, vec_col, centroids,
                                        metric="cosine", out_col="cid")
    return assigned.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "cid",
        norm(F.col(vec_col)).alias("nrm"),
    )


def _pairs_from_side(side: DataFrame, threshold: float) -> DataFrame:
    a = side.select(*[F.col(c).alias(f"{c}_a") for c in side.columns])
    b = side.select(*[F.col(c).alias(f"{c}_b") for c in side.columns])
    cos = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    return (
        a.join(
            b,
            (F.col("cid_a") == F.col("cid_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a", "id_b", F.col("cid_a").alias("cid"), cos.alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    threshold: float,
) -> DataFrame:
    """(id_a, id_b, cid, cos_sim) near-duplicate pairs within clusters,
    id_a < id_b, cosine rounded to 6 for cross-engine comparability."""
    return _pairs_from_side(
        _assigned_side(df, vec_col, id_col, centroids).localCheckpoint(
            eager=False
        ),
        threshold,
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    threshold: float,
) -> DataFrame:
    """Survivors of keep-one SemDeDup: (id, cid) for every vector with no
    smaller-id near-duplicate in its cluster. The assigned side is
    MATERIALIZED once (lazy localCheckpoint) and shared by the two pair-
    join sides and the survivor projection — AQE's broadcast conversion
    of the doomed anti-join defeats plain exchange reuse, so without the
    cut the k×dim argmax (and its whole-stage-codegen compile of the
    literal centroid matrix) ran once per consumer (r13: 3 parquet scans
    of the embedding pipeline → 1)."""
    side = _assigned_side(df, vec_col, id_col, centroids).localCheckpoint(
        eager=False
    )
    pairs = _pairs_from_side(side, threshold)
    doomed = pairs.select(F.col("id_b").alias("id")).distinct()
    return side.select("id", "cid").join(doomed, "id", "left_anti")


def semantic_contamination(
    train: DataFrame,
    evals: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    threshold: float,
) -> DataFrame:
    """Cross-split semantic decontamination: flag every TRAIN vector whose
    cosine to ANY eval vector in the same cluster reaches ``threshold`` —
    (id, cid, max_eval_sim). The n-gram decontaminator catches verbatim
    overlap; this catches paraphrase-level leakage the way SemDeDup
    catches paraphrase duplicates. Same Σ cluster² discipline: both sides
    assign with the zero-shuffle argmax, candidates are the cid equi-join
    (eval side is benchmark-sized → broadcast), cosine verifies in the
    join projection, and one keyed max per train id closes it."""
    t = _assigned_side(train, vec_col, id_col, centroids)
    e = _assigned_side(evals, vec_col, id_col, centroids)
    a = t.select(*[F.col(c).alias(f"{c}_a") for c in t.columns])
    b = e.select(*[F.col(c).alias(f"{c}_b") for c in e.columns])
    cos = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6
    )
    return (
        a.join(F.broadcast(b), F.col("cid_a") == F.col("cid_b"))
        .select("id_a", F.col("cid_a").alias("cid"), cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .groupBy("id_a", "cid")
        .agg(F.max("cos_sim").alias("max_eval_sim"))
        .select(F.col("id_a").alias("id"), "cid", "max_eval_sim")
    )
