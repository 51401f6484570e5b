"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_knn``: exact cosine top-k against a query vector. The query
  side is a 1-row broadcast; scoring is JVM-side ``zip_with``/``aggregate``
  inside codegen; top-k is a ``row_number``-free global sort-limit (Spark
  runs takeOrdered — no full sort materialization).
- ``lsh_bucketed_knn``: approximate variant — random-hyperplane sign
  buckets shrink the candidate set; probes the query's bucket (plus
  multi-probe neighbors at Hamming distance 1). At 100 TB, the bucket join
  replaces the full scan; recall is tunable by planes/probes.
- ``ivf_knn``: IVF-style — k-means-ish coarse centroids picked by
  deterministic sampling, vectors assigned to nearest centroid (one pass),
  query probes the ``n_probe`` nearest centroids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity, dot, norm


def _query_df(spark: SparkSession, query_vec: list[float]):
    return F.broadcast(
        spark.createDataFrame([(query_vec,)], schema="q array<double>")
    )


def brute_force_knn(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 5,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    q = _query_df(spark, query_vec)
    scored = df.crossJoin(q).select(
        F.col(id_col),
        *(extra_cols or []),
        F.round(cosine_similarity(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def hyperplane_signature(vec_col, planes: list[list[float]]):
    """Bit signature: sign of dot(v, plane_i) per random hyperplane.

    Built as ONE ``transform`` over a literal array-of-planes with the bit
    weights zipped in — a codegen loop over the plane array — instead of
    unrolling a separate dot-product fold per plane. Unrolled, 8 planes ×
    64 dims inlined ~4 KLoC of generated Java per plan and cost seconds of
    compile time on every cold run (measured 8 s → see git history); the
    loop form compiles once, fast, and computes the same signature."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    from ..functions.vectors import literal_matrix

    planes_lit = literal_matrix(planes)
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(len(planes))])
    dots = F.transform(planes_lit, lambda p: dot(v, p))
    bits = F.zip_with(
        dots, weights,
        lambda d, w: F.when(d > 0, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def plane_dots(vec_col, planes: list[list[float]]):
    """``array<double>`` of dot(v, plane_i) per literal hyperplane — the
    codegen-loop form (ONE ``transform`` over the literal plane matrix;
    see ``hyperplane_signature`` for why not unrolled). Materialize this
    as a COLUMN before deriving band keys: referencing the transform
    inside several band expressions would inline the full literal matrix
    once per band, and a 64×64 matrix × 4 bands cost ~5 s of whole-stage
    codegen compilation per cold plan (measured — the r11 regression)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    from ..functions.vectors import literal_matrix

    return F.transform(literal_matrix(planes), lambda p: dot(v, p))


def buckets_from_dots(dots_col, n_planes: int, bands: int):
    """Per-band LSH bucket keys as one ``array<long>`` from a materialized
    ``plane_dots`` column — band *b*'s key is the sign pattern of planes
    ``[b·w, (b+1)·w)`` packed little-endian.

    Unlike ``hyperplane_signature`` (one packed long, ≤ 63 planes), each
    band packs only ``n_planes/bands`` bits, so total plane count is
    unbounded — the knob that lets the band-join bucket count scale with
    corpus size (64 planes / 4 bands = 65,536 buckets per band) instead of
    being pinned at 2^8 by the single-long ceiling."""
    d = F.col(dots_col) if isinstance(dots_col, str) else dots_col
    if n_planes % bands:
        raise ValueError(f"{n_planes} planes do not split into {bands} bands")
    per_band = n_planes // bands
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(per_band)])
    return F.array(*[
        F.aggregate(
            F.zip_with(
                F.slice(d, b * per_band + 1, per_band),
                weights,
                lambda x, w: F.when(x > 0, w).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for b in range(bands)
    ])



def lsh_bucketed_knn(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 5,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane-sign bucket
    matches the query's (or differs by one bit with multiprobe)."""
    bucketed = df.withColumn("__bucket", hyperplane_signature(vec_col, planes))
    qsig = 0
    import math

    for i, p in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, p))
        if d > 0:
            qsig |= 1 << i
    probes = [qsig]
    if multiprobe:
        # probe all buckets within Hamming distance 2 of the query signature
        nb = len(planes)
        probes += [qsig ^ (1 << i) for i in range(nb)]
        probes += [qsig ^ (1 << i) ^ (1 << j) for i in range(nb) for j in range(i + 1, nb)]
    cand = bucketed.filter(F.col("__bucket").isin(probes))
    return brute_force_knn(spark, cand, vec_col, id_col, query_vec, k)


def ivf_knn(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 5,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF: centroids default to a deterministic sample of the data itself
    (cheap, one job over a tiny sample); pass ``centroids=`` from
    ``operators.clustering.train_kmeans`` for a real trained index (higher
    recall at the same probe fraction). Assignment is a PER-ROW argmax over
    a literal centroid array — zero row expansion, zero shuffle: the plan is
    scan → project(argmax) → filter(probed cids) → top-k. At 100 TB the
    candidate filter drops (1 - n_probe/n_centroids) of the data before
    any exchange."""
    if centroids is not None:
        cents = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    else:
        cents = [
            (i, [float(x) for x in r[0]])
            for i, r in enumerate(
                df.select(vec_col).orderBy(F.xxhash64(F.col(id_col) + seed)).limit(n_centroids).collect()
            )
        ]
    # Per-row argmax over literal centroids with the row norm materialized
    # once and centroid norms as driver-side literals — bit-identical to
    # the cosine_similarity form, ~16×64 fewer interpreted array ops per
    # row (see operators/clustering.py::with_centroid_assignment).
    from .clustering import with_centroid_assignment

    assigned = with_centroid_assignment(
        df, vec_col, [v for _, v in cents], metric="cosine"
    )
    # rank centroids for the query driver-side (tiny), keep n_probe nearest
    import math

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (da * db) if da and db else 0.0

    probe_ids = [
        cid for cid, _ in sorted(
            ((i, cos(query_vec, v)) for i, v in cents),
            key=lambda t: -t[1],
        )[:n_probe]
    ]
    cand = assigned.filter(F.col("__cid").isin(probe_ids)).drop("__cid")
    return brute_force_knn(spark, cand, vec_col, id_col, query_vec, k)


def bucketed_topk_neighbors(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
    k: int = 3,
    bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Batch approximate kNN: top-k neighbors for EVERY vector, scored only
    over LSH band-bucket candidate pairs — the scale path for the exact
    all-pairs + window query (``plans/vectors.py::knn_all_pairs_top3``).

    Same final per-vector ``row_number`` window; the O(n²) self-join is
    replaced by an equi-join on (band, band-bits of the hyperplane-sign
    signature), so pair generation is Σ bucket² and the window input is the
    candidate set, not all pairs. Recall is tunable by planes/bands.

    ``max_bucket`` is the heavy-bucket scale guard for TOP-K semantics
    (anchor-star would wreck per-vector neighbor lists, so this one
    TRUNCATES TARGETS instead): within each (band, bucket), only the
    ``max_bucket`` members ranked first by ``(md5(id), id)`` — a
    deterministic pseudo-random sample both engines can reproduce — serve
    as candidate NEIGHBORS; every vector still probes its buckets, so each
    emits ≤ bands·max_bucket candidates (n·bands·cap total, linear in n)
    and loses only neighbors sampled out of an over-full bucket.
    """
    from ..functions.vectors import dot, norm

    bits = len(planes)
    per_band = bits // bands
    mask = (1 << per_band) - 1
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
        hyperplane_signature(vec_col, planes).alias("sig"),
    )
    from .dedup import banded_explode

    banded = banded_explode(
        base,
        ["id", "v", "nrm", "sig"],
        [
            F.shiftrightunsigned("sig", b * per_band).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ],
        scale_guard="max-bucket-cap" if max_bucket is not None
        else "uncapped-baseline",
    )
    # spread the scoring join across every core: the source is often a few
    # parquet splits, and a broadcast self-join parallelizes by STREAM-side
    # partitions (scoring work follows stream rows, so round-robin spread
    # survives bucket skew; at SMJ scale AQE skew-split takes over)
    banded = banded.repartition(df.sparkSession.sparkContext.defaultParallelism)
    targets = banded
    if max_bucket is not None:
        tw = Window.partitionBy("band", "bucket").orderBy(
            F.md5(F.col("id").cast("string")), F.col("id")
        )
        targets = (
            banded.withColumn("__tr", F.row_number().over(tw))
            .filter(F.col("__tr") <= max_bucket)
            .drop("__tr")
        )
    a, b = banded.alias("a"), targets.alias("b")

    # pair-dedup WITHOUT a shuffle: a pair colliding in several bands is
    # kept only in its LOWEST matching band — an expression filter inside
    # the join (both sigs are in hand), replacing a dropDuplicates exchange
    # that would move full vector payloads per candidate pair. With the
    # target cap the trick is UNSOUND (the lower band's target may be
    # truncated away, silently dropping the pair everywhere), so the capped
    # path dedupes candidates explicitly — its exchange is bounded by
    # n·bands·max_bucket rows of (id, id, double).
    def _band_bits(col, bb):
        return F.shiftrightunsigned(col, bb * per_band).bitwiseAND(F.lit(mask))

    lowest_band = F.lit(True)
    if max_bucket is None:
        for bb in range(bands - 1):
            lowest_band = lowest_band & (
                (F.col("a.band") <= bb)
                | (_band_bits(F.col("a.sig"), bb) != _band_bits(F.col("b.sig"), bb))
            )
    # score INSIDE the join projection: rejected pairs never shuffle
    scored = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id"))
            & lowest_band,
        )
        .select(
            F.col("a.id").alias("vec_id"),
            F.col("b.id").alias("neighbor_id"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
            ).alias("cos_sim"),
        )
    )
    if max_bucket is not None:
        scored = scored.dropDuplicates(["vec_id", "neighbor_id"])
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
