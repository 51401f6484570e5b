"""Embedding covariance + PCA projection — the dimensionality-reduction /
whitening step an embedding pipeline runs before ANN indexing or SemDeDup
(OPQ-style rotation, variance pruning, drift monitoring).

100 TB shape: the ONLY corpus-sized pass is a per-partition Gramian
accumulation — mapInPandas computes each partition's (n, Σx, Σx·xᵀ) with
one numpy matmul per Arrow batch and emits 1 + d + d² numbers; partials
sum associatively in one keyed agg over (position, value) rows (d=64 →
4,161 doubles per partition — mergeable state, exactly the sketch-family
argument). The eigen-solve runs on the DRIVER over the collected d×d
matrix — bounded by the embedding dimension, never the corpus (the
k-means/BPE bounded-driver pattern). Projection back over the corpus is
one zip_with dot product per component — JVM codegen, no Python in the
hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row — a bounded 1-row read."""
    return int(df.select(F.size(vec_col).alias("d")).first()["d"])


def gram_partials(df: DataFrame, vec_col: str,
                  quantize_scale: int | None = None) -> DataFrame:
    """One row per input partition: (n, sum_vec array<d>, gram array<d²>
    row-major) — the sufficient statistics for mean and covariance.

    ``quantize_scale``: quantize each component to the exact integer
    floor(x·scale + 0.5) before accumulating, so every partial (and any
    engine recomputing the same quantization) sums IDENTICAL integers —
    the repo's integer-exact-sums discipline (see plans/stats.py). Sums
    stay exactly representable in float64 while n·(scale·max|x|)² < 2⁵³
    (scale 10⁶, |x| ≤ 1 → exact past 9M rows per dimension pair)."""
    import numpy as np  # noqa: PLC0415  (executor-side import)

    def acc(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if x.size == 0:
                continue
            if quantize_scale is not None:
                # floor(x·S + 0.5) = round-half-up, matching SQL
                # FLOOR(x * S + 0.5) bit-for-bit (same float64 ops)
                x = np.floor(x * quantize_scale + 0.5)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "sum_vec": [s.tolist()], "gram": [g.ravel().tolist()]}
        )

    return df.select(vec_col).mapInPandas(
        acc, schema="n long, sum_vec array<double>, gram array<double>"
    )


def _summed_stats(df: DataFrame, vec_col: str,
                  quantize_scale: int | None = None) -> DataFrame:
    """(pos, v): global sufficient statistics in one long-format keyed agg
    — pos 0 = n, pos 1..d = Σx, pos d+1..d+d² = Σx·xᵀ. One mapInPandas
    pass + one (tiny) shuffle on pos; adding executors only adds partial
    rows, never widens the agg."""
    parts = gram_partials(df, vec_col, quantize_scale)
    return (
        parts.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")),
                    F.col("sum_vec"),
                    F.col("gram"),
                )
            ).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("v"))
    )


def covariance_matrix(df: DataFrame, vec_col: str,
                      quantize_scale: int | None = None) -> DataFrame:
    """(i, j, cov): population covariance cov[i,j] = Σx_i x_j / n − μ_i μ_j,
    exploded to cells so an engine-independent oracle can check every
    value. Built from the long-format stats with two broadcast joins of
    the d-row mean table onto the d²-row Gramian table.

    With ``quantize_scale`` the covariance is computed over the
    quantized components q = floor(x·S + 0.5) and rescaled by 1/S² —
    every sum is over exact integers, so an oracle that quantizes the
    same way reproduces each cell BIT-FOR-BIT (no accumulation-order
    sensitivity at the ROUND boundary)."""
    s_mu = float(quantize_scale) if quantize_scale is not None else 1.0
    d = _dim(df, vec_col)
    stats = _summed_stats(df, vec_col, quantize_scale)
    n = stats.filter(F.col("pos") == 0).select(F.col("v").alias("n_rows"))
    mu = (
        stats.filter((F.col("pos") >= 1) & (F.col("pos") <= d))
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("pos") - 1).alias("idx"),
            (F.col("v") / F.col("n_rows") / F.lit(s_mu)).alias("mu"),
        )
    )
    g = (
        stats.filter(F.col("pos") > d)
        .select(
            ((F.col("pos") - 1 - d) / d).cast("int").alias("i"),
            ((F.col("pos") - 1 - d) % d).cast("int").alias("j"),
            F.col("v").alias("sxy"),
        )
    )
    mi = mu.select(F.col("idx").alias("i"), F.col("mu").alias("mu_i"))
    mj = mu.select(F.col("idx").alias("j"), F.col("mu").alias("mu_j"))
    return (
        g.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            # + 0.0 folds IEEE −0.0 to +0.0 (a near-orthogonal pair can
            # round to zero from below on one engine and above on the
            # other; the value-hash sees "-0" ≠ "0")
            (
                F.round(
                    F.col("sxy") / F.col("n_rows") / F.lit(s_mu * s_mu)
                    - F.col("mu_i") * F.col("mu_j"),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def top_components(df: DataFrame, vec_col: str, k: int = 2):
    """→ (eigenvalues desc ndarray, components (k, d) ndarray, mean (d,))
    — the 1 + d + d² stats rows are the ONLY driver collect; numpy eigh
    solves the d×d system locally. Sign convention: each component's
    largest-|.| coordinate is positive → deterministic decomposition."""
    import numpy as np  # noqa: PLC0415

    d = _dim(df, vec_col)
    rows = {r["pos"]: r["v"] for r in _summed_stats(df, vec_col).collect()}
    n = rows[0]
    mu = np.array([rows[1 + i] for i in range(d)]) / n
    gram = np.array([rows[1 + d + p] for p in range(d * d)]).reshape(d, d)
    cov = gram / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    vals, vecs = w[order], v[:, order].T
    for r in range(vecs.shape[0]):
        if vecs[r, int(np.argmax(np.abs(vecs[r])))] < 0:
            vecs[r] = -vecs[r]
    return vals, vecs, mu


def pca_project(df: DataFrame, vec_col: str, id_col: str,
                k: int = 2) -> DataFrame:
    """(id, pc1..pck): every embedding projected onto the top-k principal
    axes of its own covariance, mean-centered. Two corpus passes total:
    the Gramian stats pass inside top_components, then the projection —
    k zip_with dot products against broadcast LITERAL component vectors
    (whole-stage codegen, zero Python)."""
    vals, vecs, mu = top_components(df, vec_col, k)
    cols = [F.col(id_col).alias("id")]
    for c in range(vecs.shape[0]):
        comp = vecs[c]
        # dot(x − μ, comp) = dot(x, comp) − dot(μ, comp): one zip_with
        # against the literal component, minus a precomputed scalar
        lit_comp = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                lit_comp,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        cols.append(
            F.round(dot - F.lit(float(mu @ comp)), 6).alias(f"pc{c + 1}")
        )
    return df.select(*cols)
