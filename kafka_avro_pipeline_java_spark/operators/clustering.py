"""Distributed Lloyd's k-means over an ``array<float>`` embedding column.

Trains the coarse centroids that make IVF search (``operators/similarity.py
ivf_knn``) a real index instead of a random-sample partition. The shape of
each iteration is the one a 1000-executor cluster wants:

- **assignment** is a per-row argmin/argmax against a LITERAL centroid array
  (``transform`` + ``array_position`` inside whole-stage codegen) — zero row
  expansion, zero shuffle, exactly the plan the IVF assignment uses;
- **update** is a single map-side-combined ``groupBy(cid)`` producing one
  ``count`` plus ``dim`` per-dimension sums — the shuffle moves at most
  ``k × (dim + 2)`` aggregated values, never rows;
- the driver holds only the ``k × dim`` centroid floats between iterations
  (same contract as Spark MLlib's KMeans, which collects cluster sums per
  iteration), so iteration count × one job is the total cost.

No MLlib / Vector-UDT dependency: the native ``array<float>`` column is
clustered directly.

Reference parity note: the reference pipeline (dkwkehgud77/
kafka-avro-pipeline-java) has no clustering; this is part of the
training-data north star (IVF indexing for similarity search).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, l2_distance


def _centroid_literal(centroids: list[list[float]]):
    # one parsed SQL expression, NOT k×dim F.lit nodes: per-element
    # literal construction costs one py4j round-trip each (~0.9 ms), so a
    # 40×64 matrix burned ~2.3 s of DRIVER time on every query embedding
    # it (see functions/vectors.py::literal_matrix)
    from ..functions.vectors import literal_matrix

    return literal_matrix(centroids)


def assign_to_centroids(
    vec_col, centroids: list[list[float]], metric: str = "cosine"
):
    """Per-row best-centroid id as a pure codegen expression (no shuffle).

    ``metric='cosine'`` takes the argmax similarity (spherical k-means);
    ``metric='euclidean'`` the argmin L2 distance. Ties resolve to the
    lowest centroid id (``array_position`` finds the first occurrence).
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents = _centroid_literal(centroids)
    if metric == "cosine":
        scores = F.transform(cents, lambda c: cosine_similarity(v, c))
        best = F.array_max(scores)
    elif metric == "euclidean":
        scores = F.transform(cents, lambda c: l2_distance(v, c))
        best = F.array_min(scores)
    else:
        raise ValueError(f"unknown metric: {metric}")
    return (F.array_position(scores, best) - 1).cast("int")


def with_centroid_assignment(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    metric: str = "cosine",
    out_col: str = "__cid",
    dist_col: str | None = None,
) -> DataFrame:
    """``df`` plus the best-centroid id (and optionally distance-to-best)
    as materialized columns — the efficient form of ``assign_to_centroids``
    for full-corpus passes.

    Spark's higher-order array functions evaluate interpreted, and a
    subtree referenced inside a lambda is re-evaluated per element, so the
    expression form recomputes ``norm(v)`` for every centroid. Here the
    row norm is ONE materialized column, centroid norms are driver-side
    literals (same left-fold order → bit-identical doubles), and the
    distance to the best centroid is read off the same score array
    (``1 - array_max`` / ``array_min``) instead of recomputing the metric
    against the argmax centroid. Values are exactly those of
    ``assign_to_centroids`` + ``cosine_similarity``/``l2_distance``;
    the plan stays scan → project, zero shuffle."""
    v = F.col(vec_col)
    if metric == "cosine":
        # single-Literal centroid matrix + norm vector (see
        # _centroid_literal for why per-element F.lit is a driver-time
        # trap); zip_with pairs each centroid with its precomputed norm
        cent_vals = _centroid_literal(centroids)
        from ..functions.vectors import literal_vector

        cent_norms = literal_vector(
            [math.sqrt(sum(x * x for x in c)) for c in centroids]
        )
        from ..functions.vectors import dot, norm

        out = df.withColumn("__nrm", norm(v))
        scores = F.zip_with(
            cent_vals, cent_norms, lambda c, n: dot(v, c) / (F.col("__nrm") * n)
        )
        pick, to_dist = F.array_max, lambda b: F.lit(1.0) - b
    elif metric == "euclidean":
        out = df
        scores = F.transform(_centroid_literal(centroids), lambda c: l2_distance(v, c))
        pick, to_dist = F.array_min, lambda b: b
    else:
        raise ValueError(f"unknown metric: {metric}")
    # best/argmax read the MATERIALIZED score array — referencing the raw
    # scores expression here would inline (and re-evaluate) it per use
    out = out.withColumn("__scores", scores)
    sc = F.col("__scores")
    out = out.withColumn(out_col, (F.array_position(sc, pick(sc)) - 1).cast("int"))
    if dist_col is not None:
        out = out.withColumn(dist_col, to_dist(pick(sc)))
    return out.drop("__scores", "__nrm")


def _init_centroids(df: DataFrame, vec_col: str, k: int, seed: int) -> list[list[float]]:
    """Deterministic k-sample init: seeded Bernoulli pre-filter, then a hash
    order over the survivors (operators/sample.py — the corpus is never
    shuffle-ranked for a k-row pick)."""
    from .sample import bounded_hash_sample

    rows = bounded_hash_sample(df, [vec_col], k, seed).collect()
    return [[float(x) for x in r[0]] for r in rows]


def _init_centroids_spread(
    df: DataFrame, vec_col: str, k: int, seed: int, oversample: int = 8
) -> list[list[float]]:
    """k-means++-flavoured init in ONE job: hash-sample ``oversample*k``
    candidate vectors (pseudo-random, deterministic), then run greedy
    farthest-point selection driver-side over that tiny candidate set.
    Avoids the classic failure where two plain-sample seeds land in the same
    dense cluster and some real cluster gets no centroid — without the k
    full-data passes of exact farthest-point traversal (MLlib's k-means||
    makes the same oversample-then-refine trade)."""
    from .sample import bounded_hash_sample

    m = max(k * oversample, 64)
    cand = [
        [float(x) for x in r[0]]
        for r in bounded_hash_sample(df, [vec_col], m, seed).collect()
    ]
    if len(cand) <= k:
        return cand
    chosen = [cand[0]]
    # min squared distance from each candidate to the chosen set, updated
    # incrementally: O(m*k) driver-side float math on <= 8k*dim values
    d2 = [sum((a - b) ** 2 for a, b in zip(c, chosen[0])) for c in cand]
    for _ in range(k - 1):
        far = max(range(len(cand)), key=lambda i: d2[i])
        nxt = cand[far]
        chosen.append(nxt)
        for i, c in enumerate(cand):
            nd = sum((a - b) ** 2 for a, b in zip(c, nxt))
            if nd < d2[i]:
                d2[i] = nd
    return chosen


def train_kmeans(
    df: DataFrame,
    vec_col: str,
    k: int = 16,
    max_iters: int = 10,
    seed: int = 42,
    tol: float = 1e-6,
    metric: str = "cosine",
    init: str = "spread",
) -> tuple[list[list[float]], dict]:
    """Lloyd's iterations; returns ``(centroids, info)`` where ``info`` has
    ``iterations``, ``inertia_history`` (sum of per-row distance-to-assigned,
    ``1 - cos`` for the cosine metric — monotone non-increasing), and
    ``converged``.

    Each iteration = ONE Spark job: scan → codegen assignment → partial agg
    → final agg of k groups. Empty clusters keep their previous centroid.
    """
    if metric not in ("cosine", "euclidean"):
        raise ValueError(f"unknown metric: {metric}")
    dim = len(df.select(vec_col).first()[0])
    if init == "spread":
        centroids = _init_centroids_spread(df, vec_col, k, seed)
    elif init == "sample":
        centroids = _init_centroids(df, vec_col, k, seed)
    else:
        raise ValueError(f"unknown init: {init}")
    inertia_history: list[float] = []
    converged = False
    iterations = 0

    for _ in range(max_iters):
        iterations += 1
        assigned = with_centroid_assignment(
            df, vec_col, centroids, metric, out_col="__cid", dist_col="__dist"
        )
        stats = (
            assigned.select("__cid", F.col(vec_col).alias("__v"), "__dist")
            .groupBy("__cid")
            .agg(
                F.count("*").alias("n"),
                F.sum("__dist").alias("inertia"),
                *[
                    F.sum(F.element_at("__v", i + 1).cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        inertia_history.append(float(sum(r["inertia"] for r in stats)))
        new_centroids = [list(c) for c in centroids]
        for r in stats:
            mean = [r[f"s{i}"] / r["n"] for i in range(dim)]
            if metric == "cosine":
                nrm = math.sqrt(sum(x * x for x in mean))
                if nrm > 0:
                    mean = [x / nrm for x in mean]
            new_centroids[r["__cid"]] = mean
        shift = max(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(old, new)))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            converged = True
            break

    return centroids, {
        "iterations": iterations,
        "inertia_history": inertia_history,
        "converged": converged,
    }


def cluster_sizes(df: DataFrame, vec_col: str, centroids: list[list[float]],
                  metric: str = "cosine") -> DataFrame:
    """Per-centroid membership counts — the IVF cell-balance diagnostic."""
    assigned = with_centroid_assignment(df, vec_col, centroids, metric, out_col="cid")
    return assigned.groupBy("cid").agg(F.count("*").alias("n")).orderBy("cid")
