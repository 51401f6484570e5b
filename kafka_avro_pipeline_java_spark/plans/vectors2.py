"""SemDeDup: cluster-then-compare semantic dedup over ``embeddings``.

Same literal-constant trick as the IVF/PQ read paths in plans/vectors.py:
the k-means centroids are deterministic literals, so assignment, the
within-cluster pair join, the cosine verify, and the keep-one anti-join are
all plain arithmetic a DuckDB oracle reproduces value-for-value. Swap the
literals for operators/clustering.train_kmeans output and the plan is the
production SemDeDup (Abbas et al. 2023) pipeline unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.vectors import lcg_planes
from ..operators import semdedup
from ..sources import load_table
from .registry import query
from .vectors import _EMB_DIM, _pynorm

_SEM_THRESHOLD = 0.4
# k ∝ √n is the paper's own scale rule (pair volume Σ cluster² ≈ n²/k):
# 40 ≈ √2000 for the largest driver-visible embeddings table. At a real
# corpus scale k grows with n and the literals come from train_kmeans.
_SEM_K = 40
_SEM_CENTS = lcg_planes(_SEM_K, _EMB_DIM, seed=7)


def _semdedup_oracle(cents: list[list[float]], threshold: float) -> str:
    nc = [_pynorm(c) for c in cents]
    n = len(cents)
    dot_cols = ",\n             ".join(
        f"SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(([{', '.join(repr(x) for x in c)}])[i.i] AS DOUBLE)) AS d{j}"
        for j, c in enumerate(cents)
    )
    sim_cols = ",\n           ".join(
        f"d{j} / (SQRT(nsq) * {nc[j]!r}) AS s{j}" for j in range(n)
    )
    first_max = " ".join(f"WHEN s{j} = mx THEN {j}" for j in range(n))
    return f"""
    WITH dots AS (
      SELECT vec_id,
             {dot_cols},
             SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE)) AS nsq
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), sims AS (
      SELECT vec_id, SQRT(nsq) AS nrm,
           {sim_cols}
      FROM dots
    ), assigned AS (
      SELECT vec_id, nrm,
             CASE {first_max} END AS cid
      FROM (SELECT *, GREATEST({', '.join(f's{j}' for j in range(n))}) AS mx FROM sims)
    ), pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
    ), pd AS (
      SELECT p.ia, p.ib,
             SUM(CAST(ea.embedding[i.i] AS DOUBLE) * CAST(eb.embedding[i.i] AS DOUBLE)) AS dp
      FROM pairs p
      JOIN embeddings ea ON ea.vec_id = p.ia
      JOIN embeddings eb ON eb.vec_id = p.ib,
           UNNEST(range(1, len(ea.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    ), doomed AS (
      SELECT DISTINCT p.ib AS id
      FROM pd p
      JOIN assigned na ON na.vec_id = p.ia
      JOIN assigned nb ON nb.vec_id = p.ib
      WHERE ROUND(p.dp / (na.nrm * nb.nrm), 6) >= {threshold}
    )
    SELECT vec_id, CAST(cid AS INT) AS cid FROM assigned
    WHERE vec_id NOT IN (SELECT id FROM doomed)
    """


@query("dedup_semantic", oracle=_semdedup_oracle(_SEM_CENTS, _SEM_THRESHOLD))
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivors: assign every embedding to its nearest of 40
    literal centroids (the zero-shuffle codegen argmax shared with IVF),
    compare pairs ONLY within a cluster (equi-join on cid — Σ cluster²
    candidates, never n²), and keep the lowest id per near-dup pair
    (operators/semdedup.py). Output: (vec_id, cid) survivors."""
    e = load_table(spark, sf_dir, "embeddings")
    return semdedup.semantic_dedup(
        e, "embedding", "vec_id", _SEM_CENTS, _SEM_THRESHOLD
    ).withColumnRenamed("id", "vec_id")
