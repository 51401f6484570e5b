"""Product quantization (PQ) — the billion-scale ANN compression path.

PQ splits each vector into ``m`` subvectors and replaces every subvector
with the id of its nearest centroid from a per-subspace codebook of
``ksub`` entries, so a ``dim``-float vector becomes ``m`` small codes
(m=8, ksub=16 → 8 codes of 4 bits: 64 floats → 4 bytes, 64× smaller).
Query-time scoring is Asymmetric Distance Computation (ADC): the query
precomputes one ``m × ksub`` lookup table of partial dot products, and a
row's approximate similarity is ``m`` table lookups + adds — no float
vector is ever read again.

Division of labor, matching how FAISS-style IVF-PQ systems run at scale:

- **training** is driver-side numpy k-means over a BOUNDED sample
  (codebooks are m × ksub × dsub floats — tiny; FAISS likewise trains on
  ~100k sampled vectors, not the corpus);
- **encoding** is a shuffle-free projection chain: per subspace, argmin L2
  over a literal centroid array (``slice`` + ``transform`` +
  ``array_position``) — streams the corpus once, writes only codes.
  (Spark's higher-order array functions evaluate interpreted, not
  codegen'd, so shared subtrees — the norm, the normalized vector, each
  subvector — are materialized as separate projection steps; see
  ``pq_encode``.)
- **ADC scoring** is a single projection over the codes column:
  ``zip_with(codes, literal_lut)`` + ``aggregate`` — the 100 TB query plan
  is scan(codes) → project(score) → TakeOrdered(k), no shuffle, no join,
  and the scan reads ``m`` bytes per row instead of ``4·dim``.

Reference parity note: the reference pipeline (dkwkehgud77/
kafka-avro-pipeline-java) has no vector search; this extends the
training-data north star (similarity search at 100 TB scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_distance, literal_matrix


def train_pq(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 10_000,
    max_iters: int = 12,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: ``codebooks[s]`` = ``ksub`` centroids
    of the ``s``-th subvector slice. One deterministic bounded sample
    collect (seeded Bernoulli pre-filter + hash order over survivors —
    operators/sample.py; the corpus is never shuffle-ranked), then numpy
    Lloyd's per subspace driver-side — training cost is independent of
    corpus size.

    Input vectors should be L2-normalized first if ADC is to approximate
    cosine (see ``pq_encode(normalize=True)``).
    """
    import numpy as np

    from .sample import bounded_hash_sample

    rows = bounded_hash_sample(df, [vec_col], sample_size, seed).collect()
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    x = x / nrm
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    codebooks: list[list[list[float]]] = []
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        k = min(ksub, n)
        cents = xs[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(max_iters):
            # n × k distance matrix; n is bounded by sample_size
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        codebooks.append([[float(v) for v in c] for c in cents])
    return codebooks


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[list[list[float]]],
    normalize: bool = True,
) -> DataFrame:
    """(id, codes) with ``codes[s]`` = nearest codebook entry of subvector
    ``s`` — a shuffle-free projection chain. ``normalize=True`` encodes
    the L2-normalized vector so ADC dot products approximate cosine.

    Expression-cost note: Spark's higher-order array functions (transform/
    aggregate/zip_with) evaluate INTERPRETED, and a column reference used
    inside a lambda is inlined as its whole defining subtree. Building the
    norm, the normalized vector, and each subvector slice as SEPARATE
    projections materializes each once per row; folding them into one
    expression re-evaluated the norm aggregate inside every per-codeword
    lambda element (~100× per-row cost, measured 12 ms/row before vs
    ~0.1 ms/row after). Stacked Projects stay one fused stage — still no
    shuffle, still one pass."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
    if normalize:
        out = out.withColumn(
            "_nrm",
            F.sqrt(F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x * x)),
        ).withColumn(
            "_vn",
            F.transform(
                F.col("_v"),
                lambda x: x / F.when(F.col("_nrm") > 0, F.col("_nrm")).otherwise(F.lit(1.0)),
            ),
        )
    else:
        out = out.withColumn("_vn", F.col("_v"))
    # materialize each subvector once, then argmin against its codebook
    out = out.select(
        "id",
        *[F.slice(F.col("_vn"), s * dsub + 1, dsub).alias(f"_sub{s}") for s in range(m)],
    )
    codes = []
    for s in range(m):
        cents = literal_matrix(codebooks[s])
        d2 = F.transform(cents, lambda c: l2_distance(F.col(f"_sub{s}"), c))
        codes.append((F.array_position(d2, F.array_min(d2)) - 1).cast("int"))
    return out.select("id", F.array(*codes).alias("codes"))


def _adc_lut(query_vec: list[float], codebooks: list[list[list[float]]]):
    """m × ksub literal table of partial dot products dot(q_s, centroid)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / qn for x in query_vec]
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = [
        [
            sum(q[s * dsub + j] * c[j] for j in range(dsub))
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    return literal_matrix(lut)


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
) -> DataFrame:
    """Top-k by ADC over an encoded (id, codes) table: approximate cosine =
    Σ_s lut[s][codes[s]] — m lookups per row, TakeOrdered(k) for the top-k.
    No shuffle; the scan reads codes, never vectors."""
    lut = _adc_lut(query_vec, codebooks)
    score = F.aggregate(
        F.zip_with(F.col("codes"), lut, lambda c, tbl: F.element_at(tbl, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes_df.select(
            F.col("id").alias("vec_id"), F.round(score, 6).alias("adc_sim")
        )
        .orderBy(F.desc("adc_sim"), F.asc("vec_id"))
        .limit(k)
    )


def pq_rerank_topk(
    spark: SparkSession,
    df: DataFrame,
    codes_df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """Two-stage retrieval: ADC shortlist (codes only, no shuffle) → exact
    cosine re-rank of the shortlist ids. PQ separates CLUSTERS crisply but
    its quantization error exceeds within-cluster similarity differences,
    so production systems always re-rank a shortlist against the float
    vectors; the shortlist is k-sized, so the re-rank join is a broadcast
    of ``shortlist`` ids — the corpus still never shuffles."""
    from .similarity import brute_force_knn

    short = pq_adc_topk(codes_df, query_vec, codebooks, k=shortlist).select(
        F.col("vec_id").alias(id_col)
    )
    cand = df.join(F.broadcast(short), id_col)
    return brute_force_knn(spark, cand, vec_col, id_col, query_vec, k)


def ivf_pq_topk(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 4,
    k: int = 5,
    rerank: int | None = None,
) -> DataFrame:
    """The complete billion-scale ANN read path: IVF coarse probe + PQ ADC.

    Rows are assigned to their coarse cell by the same zero-shuffle codegen
    argmax the IVF index uses, cells outside the ``n_probe`` closest to the
    query are filtered out, and survivors are scored by ADC over their PQ
    codes — scan → project → filter → project → TakeOrdered, no shuffle
    before the top-k. At 100 TB the corpus is STORED partitioned by coarse
    cell with codes precomputed, so the probe filter becomes partition
    pruning and the scan touches ``n_probe/nlist`` of the data, reading
    ``m``-byte codes instead of ``4·dim``-byte vectors.
    """
    import math

    from .clustering import with_centroid_assignment

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = [x / qn for x in query_vec]

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(q, c)) / cn

    probe = sorted(range(len(coarse_centroids)),
                   key=lambda i: -cos(coarse_centroids[i]))[:n_probe]
    assigned = with_centroid_assignment(df, vec_col, coarse_centroids, "cosine")
    cand = assigned.filter(F.col("__cid").isin(probe)).drop("__cid")
    codes = pq_encode(cand, vec_col, id_col, codebooks)
    if rerank:
        return pq_rerank_topk(spark, cand, codes, vec_col, id_col, query_vec,
                              codebooks, k, shortlist=rerank)
    return pq_adc_topk(codes, query_vec, codebooks, k)


def save_pq_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    *,
    codebooks: list[list[list[float]]] | None = None,
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Build-once persistence for the PQ index: encode the corpus and write
    ``<path>/codes`` (parquet: id, codes) plus ``<path>/codebooks.json``
    (the tiny model). The 100 TB division of labor made explicit: the
    expensive streaming encode happens once at build time; every later
    query reads ``m`` small codes per row and never touches the float
    vectors. Returns the codebooks (trained here unless provided)."""
    import json
    import os

    if codebooks is None:
        codebooks = train_pq(
            df, vec_col, m=m, ksub=ksub, sample_size=sample_size, seed=seed
        )
    pq_encode(df, vec_col, id_col, codebooks).write.mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    with open(os.path.join(path, "codebooks.json"), "w") as f:
        json.dump(codebooks, f)
    return codebooks


def load_pq_index(spark: SparkSession, path: str):
    """(codes DataFrame, codebooks) pair from ``save_pq_index`` output —
    query with ``pq_adc_topk(codes, qv, codebooks)`` (codes-only scan) or
    ``pq_rerank_topk`` when the raw vectors are also at hand."""
    import json
    import os

    with open(os.path.join(path, "codebooks.json")) as f:
        codebooks = json.load(f)
    return spark.read.parquet(os.path.join(path, "codes")), codebooks


def sq8_bounds(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension (lo, hi-lo) quantization bounds as ONE row of two
    arrays — the scalar-quantization 'codebook', derived from the data
    with a posexplode + per-dim min/max (map-side-combinable partials:
    the shuffle carries partitions×dim rows, not corpus rows) and folded
    back to a single broadcastable row. Order-independent aggregates, so
    the bounds — and every code derived from them — are engine-exact."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    bounds = ex.groupBy("pos").agg(
        F.min(F.col("x").cast("double")).alias("lo"),
        F.max(F.col("x").cast("double")).alias("hi"),
    )
    return bounds.agg(
        F.array_sort(F.collect_list(F.struct("pos", "lo", "hi"))).alias("b")
    ).select(
        F.transform("b", lambda s: s["lo"]).alias("lo"),
        F.transform("b", lambda s: s["hi"] - s["lo"]).alias("hl"),
    )


def sq8_encode(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """int8 scalar quantization: (id, codes array<int>, lo, hl). Each
    dimension is binned independently into 256 levels of its own [lo, hi]
    range — 1 byte/dim at rest (4× smaller than float32; PQ compresses
    harder, SQ decodes cheaper and needs no training). code =
    least(floor(((x-lo)/(hi-lo))*256), 255), constant dims → 0; the
    expression is mirrored verbatim in the DuckDB oracle so codes match
    integer-for-integer. The bounds row is a broadcast; encoding is a
    zero-shuffle projection (separate materialized steps — higher-order
    lambdas get no subexpression elimination, see SCALE.md).

    Precondition: every vector has the SAME length (true of any embedding
    column). A ragged short vector would zip against the full-length
    bounds arrays and produce NULL codes for its missing dims."""
    bounds = sq8_bounds(df, vec_col)
    vd = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vd"),
    )
    withb = vd.crossJoin(F.broadcast(bounds))
    shifted = withb.select(
        "id",
        "lo",
        "hl",
        F.zip_with("vd", "lo", lambda x, l: x - l).alias("sh"),
    )
    return shifted.select(
        "id",
        "lo",
        "hl",
        F.zip_with(
            "sh",
            "hl",
            lambda d, s: F.when(s == 0.0, F.lit(0))
            .otherwise(
                F.least(F.floor((d / s) * F.lit(256.0)), F.lit(255)).cast("int")
            )
            .cast("int"),
        ).alias("codes"),
    )


def sq8_adc_topk(
    codes: DataFrame, query_df: DataFrame, k: int = 5
) -> DataFrame:
    """Asymmetric top-k on SQ8 codes: the query stays full-precision, each
    code decodes to its bin CENTER (lo + (c+0.5)·hl/256) and the L2
    distance is a 1-row-broadcast zip_with/aggregate projection over the
    codes scan — d bytes/row, zero shuffle, TakeOrdered top-k; the
    scan→project→TakeOrdered read path every quantized index shares
    (``pq_adc_topk`` docstring). ``query_df``: one row with column ``q``
    (array<double>). Output (id, sq_dist) ascending, id tiebreak."""
    withq = codes.crossJoin(F.broadcast(query_df))
    dec1 = withq.select(
        "id",
        "lo",
        "q",
        F.zip_with(
            "codes", "hl", lambda c, s: ((c.cast("double") + 0.5) * s) / 256.0
        ).alias("d1"),
    )
    dec = dec1.select(
        "id", "q", F.zip_with("d1", "lo", lambda t, l: t + l).alias("dec")
    )
    diff = dec.select(
        "id",
        F.zip_with("dec", "q", lambda a, b: (a - b) * (a - b)).alias("d2"),
    )
    dist = diff.select(
        "id",
        F.round(
            F.aggregate("d2", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("sq_dist"),
    )
    return dist.orderBy(F.asc("sq_dist"), F.asc("id")).limit(k)
