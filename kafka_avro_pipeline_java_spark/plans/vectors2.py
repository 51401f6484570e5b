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
from pyspark.sql import functions as F

from ..functions.vectors import lcg_planes
from ..operators import dedup, semdedup
from ..sources import load_table
from .registry import query
from .vectors import (
    _DEDUP_BANDS,
    _DEDUP_MAX_BUCKET,
    _DEDUP_PLANES,
    _EMB_DIM,
    _bucketed_embedding_oracle,
    _pynorm,
)

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


def _outlier_oracle(cents: list[list[float]], z_min: float) -> str:
    nc = [_pynorm(c) for c in cents]
    n = len(cents)
    dot_cols = ",\n             ".join(
        f"SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(([{', '.join(repr(x) for x in c)}])[i.i] AS DOUBLE)) AS d{j}"
        for j, c in enumerate(cents)
    )
    sim_cols = ",\n           ".join(
        f"d{j} / (SQRT(nsq) * {nc[j]!r}) AS s{j}" for j in range(n)
    )
    return f"""
    WITH dots AS (
      SELECT vec_id,
             {dot_cols},
             SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE)) AS nsq
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), dist AS (
      SELECT vec_id,
             1.0 - GREATEST({', '.join(f's{j}' for j in range(n))}) AS dist
      FROM (SELECT vec_id, {sim_cols} FROM dots) s
    ), stats AS (
      SELECT AVG(dist) AS mu, STDDEV_SAMP(dist) AS sigma FROM dist
    )
    SELECT vec_id, ROUND(dist, 6) AS dist,
           ROUND((dist - mu) / sigma, 4) AS zscore
    FROM dist, stats
    WHERE (dist - mu) / sigma >= {z_min}
    """


_OUTLIER_Z = 1.5


@query("embedding_outliers", oracle=_outlier_oracle(_SEM_CENTS, _OUTLIER_Z))
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier pruning: score every vector by its cosine
    distance to the nearest centroid, z-score over the corpus, and report
    vectors ≥ 1.5σ farther than average — the curation pass that drops
    noise/garbled embeddings before training (and flags cells needing more
    centroids). Reuses the zero-shuffle assignment projection; the global
    mean/σ is a 1-row broadcast aggregate, so the whole detector is one
    corpus scan plus one scalar exchange."""
    from pyspark.sql import functions as F

    from ..operators.clustering import with_centroid_assignment

    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(spark.sparkContext.defaultParallelism)
    # r14: the 40-centroid × 64-dim assignment projection fed BOTH the
    # mu/sigma aggregate and the final filter — the whole codegen argmax
    # ran twice. Materialize the (vec_id, dist) projection once (two
    # narrow columns, corpus rows — the embedding arrays themselves are
    # NOT stored, §2.4) and derive both consumers from it.
    assigned = with_centroid_assignment(
        e, "embedding", _SEM_CENTS, metric="cosine", out_col="__cid",
        dist_col="dist",
    ).select("vec_id", "dist").localCheckpoint(eager=False)
    stats = assigned.agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sigma")
    )
    z = (F.col("dist") - F.col("mu")) / F.col("sigma")
    return (
        assigned.crossJoin(F.broadcast(stats))
        .filter(z >= _OUTLIER_Z)
        .select(
            "vec_id",
            F.round("dist", 6).alias("dist"),
            F.round(z, 4).alias("zscore"),
        )
    )


def _sem_contamination_oracle(cents: list[list[float]], threshold: float) -> str:
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
      FROM assigned a JOIN assigned b ON a.cid = b.cid
      WHERE a.vec_id % 97 <> 0 AND b.vec_id % 97 = 0
    ), pd AS (
      SELECT p.ia, p.ib,
             SUM(CAST(ea.embedding[i.i] AS DOUBLE) * CAST(eb.embedding[i.i] AS DOUBLE)) AS dp
      FROM pairs p
      JOIN embeddings ea ON ea.vec_id = p.ia
      JOIN embeddings eb ON eb.vec_id = p.ib,
           UNNEST(range(1, len(ea.embedding) + 1)) AS i(i)
      GROUP BY 1, 2
    )
    SELECT p.ia AS vec_id, CAST(na.cid AS INT) AS cid,
           MAX(ROUND(p.dp / (na.nrm * nb.nrm), 6)) AS max_eval_sim
    FROM pd p
    JOIN assigned na ON na.vec_id = p.ia
    JOIN assigned nb ON nb.vec_id = p.ib
    WHERE ROUND(p.dp / (na.nrm * nb.nrm), 6) >= {threshold}
    GROUP BY 1, 2
    """


_CONTAM_THRESHOLD = 0.3


@query(
    "pipeline_decontaminate_semantic",
    oracle=_sem_contamination_oracle(_SEM_CENTS, _CONTAM_THRESHOLD),
)
def pipeline_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase-level decontamination: flag TRAIN embeddings (vec_id %
    97 ≠ 0) whose cosine to ANY eval embedding (vec_id % 97 = 0) in the
    same cluster reaches 0.3 — the semantic counterpart of the n-gram
    overlap check (verbatim leak → pipeline_decontaminate_ngram;
    paraphrase leak → this). Both sides share the zero-shuffle centroid
    argmax; the benchmark side is broadcast, so the train corpus never
    shuffles for the check (operators/semdedup.py::semantic_contamination)."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") % 97 != 0)
    evals = e.filter(F.col("vec_id") % 97 == 0)
    out = semdedup.semantic_contamination(
        train, evals, "embedding", "vec_id", _SEM_CENTS, _CONTAM_THRESHOLD
    )
    return out.select(F.col("id").alias("vec_id"), "cid", "max_eval_sim")


@query(
    "knn_sq8_adc_oracle",
    oracle="""
    WITH bounds AS MATERIALIZED (
      SELECT i.i AS pos,
             MIN(CAST(embedding[i.i] AS DOUBLE)) AS lo,
             MAX(CAST(embedding[i.i] AS DOUBLE))
               - MIN(CAST(embedding[i.i] AS DOUBLE)) AS hl
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY i.i
    ), q AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), codes AS MATERIALIZED (
      SELECT e.vec_id, b.pos, b.lo, b.hl,
             CASE WHEN b.hl = 0 THEN 0
                  ELSE LEAST(CAST(FLOOR(((CAST(e.embedding[b.pos] AS DOUBLE)
                                          - b.lo) / b.hl) * 256.0) AS INT),
                             255)
             END AS code
      FROM embeddings e, bounds b
    ), score AS (
      SELECT c.vec_id,
             SUM(POWER(c.lo + ((CAST(c.code AS DOUBLE) + 0.5) * c.hl) / 256.0
                       - CAST(q.qv[c.pos] AS DOUBLE), 2)) AS dist
      FROM codes c, q
      GROUP BY c.vec_id
    )
    SELECT vec_id, ROUND(dist, 6) AS sq_dist
    FROM score ORDER BY sq_dist, vec_id LIMIT 5
    """,
)
def knn_sq8_adc_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The int8 SCALAR-quantization read path, fully oracle-checked — the
    third member of the quantized-index family (IVF = partition pruning,
    PQ = hardest compression, SQ8 = training-free 4x compression with
    the cheapest decode). Per-dim [lo, hi] bounds come FROM THE DATA (a
    map-side-combined per-dim min/max folded to one broadcast row — no
    literals, no trainer), codes are an exact integer function of
    (x, lo, hi) mirrored verbatim in the oracle SQL, and scoring decodes
    to bin centers against the full-precision vec_id=0 query: the
    scan->project->TakeOrdered shape reading d bytes/row at 100 TB
    (operators/pq.py::sq8_encode/sq8_adc_topk)."""
    from pyspark.sql import functions as F

    from ..operators.pq import sq8_adc_topk, sq8_encode

    e = load_table(spark, sf_dir, "embeddings")
    codes = sq8_encode(e, "embedding", "vec_id")
    qdf = e.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("q")
    )
    out = sq8_adc_topk(codes, qdf, k=5)
    return out.select(F.col("id").alias("vec_id"), "sq_dist")


@query(
    "knn_filtered_cosine",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             SUM(CAST(e.embedding[i.i] AS DOUBLE)
                 * CAST(q.qv[i.i] AS DOUBLE)) AS dp,
             SUM(CAST(e.embedding[i.i] AS DOUBLE)
                 * CAST(e.embedding[i.i] AS DOUBLE)) AS na,
             SUM(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS nb
      FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS i(i)
      WHERE e.label = 3 AND e.vec_id <> 0
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, ROUND(dp / (SQRT(na) * SQRT(nb)), 6) AS cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """,
)
def knn_filtered_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search: exact cosine top-5 to the vec_id=0
    embedding among label=3 vectors only — the "nearest documents in this
    domain/language/split" shape every production vector store exposes as
    pre-filtering. In Spark the predicate is just a filter the optimizer
    pushes INTO the parquet scan (PushedFilters on label — asserted in
    tests/test_similarity.py), so selective filters shrink the scan
    itself rather than post-filtering scored candidates (post-filtering
    is the recall trap filtered-ANN papers warn about; with exact scoring
    under a pushed filter the semantics stay exact by construction). At
    100 TB, partitioning the codes table BY the filter column turns the
    same plan into partition pruning — the IVF variant of that layout is
    already demonstrated in test_ivf_partitioned_codes_prune_partitions."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    )

    return (
        e.filter((F.col("label") == 3) & (F.col("vec_id") != 0))
        .crossJoin(q)
        .select(
            "vec_id",
            "label",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


_MMR_LAMBDA = 0.7
_MMR_POOL = 20
_MMR_K = 5


def _mmr_oracle(lam: float = _MMR_LAMBDA, pool: int = _MMR_POOL,
                k: int = _MMR_K) -> str:
    """Greedy MMR unrolled to ``k`` selection stages — each stage scores
    the remaining pool as λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)
    and takes the (score DESC, vec_id ASC) argmax. All similarities are
    ROUNDED TO 6 BEFORE selection on both engines, so the greedy argmax
    compares identical doubles and the chosen set cannot diverge on ULP
    noise."""
    dot = (
        "SUM(CAST(a.embedding[i.i] AS DOUBLE)"
        " * CAST(b.embedding[i.i] AS DOUBLE))"
    )
    steps = []
    steps.append(f"""
    sel1 AS (
      SELECT vec_id, simq, 1 AS rank FROM cand
      ORDER BY simq DESC, vec_id LIMIT 1
    )""")
    for i in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM sel{j}"
                                  for j in range(1, i))
        prev_all = " UNION ALL ".join(
            f"SELECT vec_id, simq, rank FROM sel{j}" for j in range(1, i)
        )
        steps.append(f"""
    sel{i} AS (
      SELECT c.vec_id, c.simq, {i} AS rank
      FROM cand c
      WHERE c.vec_id NOT IN ({prev})
      ORDER BY ROUND({lam!r} * c.simq - {(1 - lam)!r} * (
          SELECT MAX(p.sim) FROM pair p
          WHERE p.id_a = c.vec_id AND p.id_b IN ({prev})
        ), 6) DESC, c.vec_id
      LIMIT 1
    )""")
    final = " UNION ALL ".join(f"SELECT * FROM sel{j}"
                               for j in range(1, k + 1))
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             ROUND(SUM(CAST(e.embedding[i.i] AS DOUBLE)
                       * CAST(q.qv[i.i] AS DOUBLE))
                   / (SQRT(SUM(CAST(e.embedding[i.i] AS DOUBLE)
                               * CAST(e.embedding[i.i] AS DOUBLE)))
                      * SQRT(SUM(CAST(q.qv[i.i] AS DOUBLE)
                                 * CAST(q.qv[i.i] AS DOUBLE)))), 6) AS simq
      FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS i(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ),
    cand AS (
      SELECT vec_id, simq FROM scored ORDER BY simq DESC, vec_id
      LIMIT {pool}
    ),
    pair AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({dot}
                   / (SQRT(SUM(CAST(a.embedding[i.i] AS DOUBLE)
                               * CAST(a.embedding[i.i] AS DOUBLE)))
                      * SQRT(SUM(CAST(b.embedding[i.i] AS DOUBLE)
                                 * CAST(b.embedding[i.i] AS DOUBLE)))), 6)
               AS sim
      FROM embeddings a
      JOIN cand ca ON ca.vec_id = a.vec_id
      JOIN cand cb ON TRUE
      JOIN embeddings b ON b.vec_id = cb.vec_id,
      UNNEST(range(1, len(a.embedding) + 1)) AS i(i)
      WHERE a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),{",".join(steps)}
    SELECT vec_id, simq AS query_sim, rank FROM ({final})
    """


@query("knn_mmr_diversified", oracle=_mmr_oracle())
def knn_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance top-5 (Carbonell & Goldstein 1998): from
    the cosine top-20 pool for the vec_id=0 query, greedily pick items by
    λ·sim(query,d) − (1−λ)·max sim(d, already-picked) — the diversity
    re-rank a curation pipeline runs so its "nearest" exemplars aren't
    five copies of the same near-dup. The POOL scoring and the 20×20
    pairwise matrix are distributed (scan + bounded crossJoin); the
    greedy loop itself runs on the DRIVER over at most pool=20 rows
    (the BPE-trainer bounded-argmax pattern — the loop is sequential by
    definition, and its input is k²-bounded, never corpus-sized). Every
    similarity is rounded to 6 BEFORE selection on both engines so the
    argmax chain is ULP-stable; the oracle unrolls the same 5 greedy
    stages as correlated-subquery CTEs."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            "embedding",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q")), 6
            ).alias("simq"),
        )
        .orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(_MMR_POOL)
    ).localCheckpoint(eager=True)
    a = cand.select(F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("id_b"),
                    F.col("embedding").alias("eb"))
    pair_rows = (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_similarity(F.col("ea"), F.col("eb")), 6
            ).alias("sim"),
        )
        .collect()  # bounded: pool² − pool = 380 rows
    )
    simq = {r["vec_id"]: r["simq"] for r in cand.select("vec_id", "simq").collect()}
    pair = {(r["id_a"], r["id_b"]): r["sim"] for r in pair_rows}
    selected: list[int] = []
    for _ in range(_MMR_K):
        best = None
        for v, sq in simq.items():
            if v in selected:
                continue
            penalty = max(pair[(v, s)] for s in selected) if selected else 0.0
            # rounded to 6 (and computed with the exact same float
            # coefficients the oracle SQL embeds via repr) so a
            # near-tie between candidates with different penalties
            # cannot argmax-diverge on coefficient ULP noise
            score = round(_MMR_LAMBDA * sq - (1 - _MMR_LAMBDA) * penalty, 6)
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v)
        selected.append(best[1])
    rank = F.lit(None).cast("int")
    for i, v in enumerate(reversed(selected)):
        rank = F.when(F.col("vec_id") == v, F.lit(len(selected) - i)).otherwise(rank)
    return (
        cand.filter(F.col("vec_id").isin(selected))
        .select("vec_id", F.col("simq").alias("query_sim"), rank.alias("rank"))
    )


@query(
    "embedding_label_centroid_shift",
    oracle="""
    WITH el AS (
      SELECT label, i.i AS dim,
             CAST(SUM(CAST(ROUND(CAST(embedding[i.i] AS DOUBLE) * 1000000, 0)
                           AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      WHERE label < 4
      GROUP BY label, i.i
    ), cents AS (
      SELECT label, dim, CAST(s AS DOUBLE) / n / 1000000 AS c FROM el
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(SQRT(SUM((a.c - b.c) * (a.c - b.c))), 6) AS centroid_l2
    FROM cents a JOIN cents b ON b.dim = a.dim AND b.label > a.label
    GROUP BY a.label, b.label
    """,
)
def embedding_label_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise L2 distances between per-label embedding CENTROIDS — the
    cluster-separation / distribution-drift audit a curation pipeline
    runs between data slices (labels here; sources or time windows in
    production). Per-dim sums are quantized to 1e6 fixed-point BIGINTs
    BEFORE summation (exact integers — the embedding-covariance
    discipline), centroids are those integers divided identically in
    both engines, and the label×label distance matrix is
    (labels²·dim)-bounded — never data-sized. The Spark side posexplodes
    to the (label, dim) domain: rows×64, map-side combined to labels×64
    partials."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("label") < 4)
    el = (
        e.select("label", F.posexplode("embedding"))
        .select(
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.round(F.col("col").cast("double") * 1_000_000, 0)
            .cast("bigint").alias("q"),
        )
        .groupBy("label", "dim")
        .agg(
            F.sum("q").cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    cents = el.select(
        "label",
        "dim",
        (F.col("s").cast("double") / F.col("n") / 1_000_000).alias("c"),
    )
    a = cents.select(
        F.col("label").alias("label_a"), "dim", F.col("c").alias("ca")
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("c").alias("cb"),
    )
    return (
        a.join(
            b,
            (F.col("dim_b") == F.col("dim"))
            & (F.col("label_b") > F.col("label_a")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("ca") - F.col("cb"))
                        * (F.col("ca") - F.col("cb"))
                    )
                ),
                6,
            ).alias("centroid_l2")
        )
    )


@query(
    "knn_range_count_by_label",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             SUM(CAST(e.embedding[i.i] AS DOUBLE)
                 * CAST(q.qv[i.i] AS DOUBLE)) AS dp,
             SUM(CAST(e.embedding[i.i] AS DOUBLE)
                 * CAST(e.embedding[i.i] AS DOUBLE)) AS na,
             SUM(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS nb
      FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS i(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id, e.label
    ), sims AS (
      SELECT label, ROUND(dp / (SQRT(na) * SQRT(nb)), 6) AS s
      FROM scored
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_in_range,
           ROUND(MAX(s), 6) AS max_sim,
           CAST(SUM(CAST(ROUND(s * 1e6, 0) AS BIGINT)) AS BIGINT)
             AS sim_micros_sum
    FROM sims WHERE s >= 0.05
    GROUP BY label
    """,
)
def knn_range_count_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (ε-radius) vector search, aggregated by label: all vectors
    with cosine ≥ 0.05 to the vec_id=0 query, rolled up to per-label
    neighbor counts + max similarity — the "how much of each domain sits
    near this document" readout behind contamination triage and
    deduplication radius tuning (top-k asks WHO is closest; range asks
    HOW MANY are close). The scan is one broadcast-query projection with
    the threshold as an ordinary filter — no shuffle until the
    label-keyed rollup (map-side combinable), so at 100 TB it is
    scan-bound exactly like knn_cosine_bruteforce, with the label rollup
    replacing that query's global top-k. Similarities are rounded to 6
    BEFORE the threshold and the per-label aggregates (count/max/1e6-
    quantized integer sum) are order-independent, so both engines cut
    and aggregate identically."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    )
    sims = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "label",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q")), 6
            ).alias("s"),
        )
        .filter(F.col("s") >= 0.05)
    )
    return sims.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_in_range"),
        F.round(F.max("s"), 6).alias("max_sim"),
        F.sum(F.round(F.col("s") * 1e6, 0).cast("bigint"))
        .cast("bigint").alias("sim_micros_sum"),
    )


_DBSCAN_TAU = 0.2
_DBSCAN_MINPTS = 3


@query(
    "embedding_dbscan_core",
    oracle=f"""
    WITH prs AS ({{pairs}}), ends AS (
      SELECT id_a AS id, id_b AS nb FROM prs
      UNION ALL
      SELECT id_b AS id, id_a AS nb FROM prs
    ), deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM ends GROUP BY id
    ), base AS (
      SELECT e.vec_id AS id, COALESCE(d.n_neighbors, 0) AS n_neighbors
      FROM embeddings e LEFT JOIN deg d ON d.id = e.vec_id
    ), cores AS (
      SELECT id FROM base WHERE n_neighbors >= {_DBSCAN_MINPTS}
    ), near_core AS (
      SELECT DISTINCT ends.id FROM ends JOIN cores c ON ends.nb = c.id
    )
    SELECT b.id AS vec_id, b.n_neighbors,
           CASE WHEN b.n_neighbors >= {_DBSCAN_MINPTS} THEN 'core'
                WHEN nc.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role
    FROM base b LEFT JOIN near_core nc ON nc.id = b.id
    """.format(
        pairs=_bucketed_embedding_oracle(_DEDUP_PLANES, _DEDUP_BANDS, _DBSCAN_TAU,
                                         max_bucket=_DEDUP_MAX_BUCKET)
    ),
)
def embedding_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN CORE/BORDER/NOISE LABELING (Ester et al. 1996) — the
    density-based clustering primitive over the embedding space: a point
    is CORE if it has ≥ minPts neighbors at cosine ≥ τ, BORDER if it is
    not core but touches a core point, NOISE otherwise (full cluster
    assignment is then connected components over core-core edges — the
    repo's existing hybrid CC operator). The ε-neighborhood join rides
    the SAME LSH band-bucket prefilter as dedup_embedding_bucketed
    (4×16-bit band buckets + the max_bucket=100 anchor-star cap, so
    candidates are ≤ n·(cap + bands) even on sign-correlated data; the
    oracle recomputes the identical literal-hyperplane buckets, cap and
    star pairs, so the approximation is value-checked, not assumed),
    followed by two degree aggregates and one semi-join — all shuffles on
    the vector id. τ=0.2 / minPts=3 split the test embeddings
    213 core / 26 border / 261 noise at sf0.01."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_pairs_bucketed(
        e, "embedding", "vec_id", _DEDUP_PLANES,
        threshold=_DBSCAN_TAU, bands=_DEDUP_BANDS, max_bucket=_DEDUP_MAX_BUCKET,
    # the pair table feeds ends (twice) and near_core: cut it once like
    # the triangle-count plan does, instead of re-running the banded join
    ).localCheckpoint(eager=False)
    ends = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb")
    ).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    deg = ends.groupBy("id").agg(F.count("*").cast("bigint").alias("n_neighbors"))
    base = (
        e.select(F.col("vec_id").alias("id"))
        .join(deg, "id", "left")
        .select("id", F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"))
    )
    cores = base.where(F.col("n_neighbors") >= _DBSCAN_MINPTS).select("id")
    near_core = (
        ends.join(cores.withColumnRenamed("id", "nb"), "nb")
        .select("id")
        .distinct()
        .withColumn("near", F.lit(1))
    )
    return (
        base.join(near_core, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            "n_neighbors",
            F.when(F.col("n_neighbors") >= _DBSCAN_MINPTS, "core")
            .when(F.col("near").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
        )
    )


from .ivf_snapshot import TRAINED_CENTS_SF001 as _TRAINED_CENTS
from .vectors import _IVF_PROBE as _TPROBE
from .vectors import _IVF_QV as _TQV
from .vectors import _ivf_oracle as _mk_ivf_oracle


@query(
    "knn_cosine_ivf_trained_oracle",
    oracle=_mk_ivf_oracle(_TRAINED_CENTS, _TQV, _TPROBE, 5),
)
def knn_cosine_ivf_trained_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED IVF read path under a full value oracle (r10 verdict
    item 6): same ``ivf_knn`` plan as the rows-only live-trainer query
    (knn_cosine_ivf_trained), but fed the verbatim SNAPSHOT of what
    train_kmeans produced on the sf0.01 corpus
    (plans/ivf_snapshot.py — provenance re-asserted against a fresh
    training run in tests/test_similarity.py). Because the snapshot is a
    literal, the DuckDB oracle recomputes assignment, probe filter and
    exact cosine top-5 from the identical floats — closing the gap
    between "the literal-centroid plan is value-correct"
    (knn_cosine_ivf_oracle) and "the trainer's actual output drives that
    same plan": swap the literals and NOTHING else changes."""
    from ..operators import similarity
    from .ivf_snapshot import TRAINED_CENTS_SF001
    from .vectors import _IVF_PROBE, _IVF_QV

    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_knn(
        spark, e, "embedding", "vec_id", _IVF_QV,
        n_probe=_IVF_PROBE, k=5, centroids=TRAINED_CENTS_SF001,
    )


def _sign_sketch_oracle(qv: list[float], shortlist: int, k: int) -> str:
    qn = _pynorm(qv)
    qlit = "[" + ", ".join(repr(x) for x in qv) + "]"
    return f"""
    WITH s AS (
      SELECT vec_id,
             SUM(CASE WHEN (CAST(embedding[i.i] AS DOUBLE) > 0)
                        <> (({qlit})[i.i] > 0) THEN 1 ELSE 0 END) AS hamming,
             SUM(CAST(embedding[i.i] AS DOUBLE) * ({qlit})[i.i]) AS dp,
             SUM(CAST(embedding[i.i] AS DOUBLE) * CAST(embedding[i.i] AS DOUBLE)) AS nsq
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS i(i)
      GROUP BY vec_id
    ), short AS (
      SELECT * FROM s ORDER BY hamming, vec_id LIMIT {shortlist}
    )
    SELECT vec_id, CAST(hamming AS INT) AS hamming,
           ROUND(dp / (SQRT(nsq) * {qn!r}), 6) AS cos_sim
    FROM short ORDER BY cos_sim DESC, vec_id LIMIT {k}
    """


_SKETCH_SHORTLIST = 50


@query(
    "knn_sign_sketch_hamming",
    oracle=_sign_sketch_oracle(_TQV, 50, 5),
)
def knn_sign_sketch_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-QUANTIZATION ANN READ PATH — the 1-bit/dimension compression
    every modern vector store ships (sign of each component; at rest the
    64 signs pack into one BIGINT = 32× smaller than float32): shortlist
    by Hamming distance between sign sketches (here computed directly as
    the sign-mismatch count inside one codegen fold — identical math to
    popcount(xor) on the packed form), then EXACT-cosine rerank of the
    top-50 shortlist. Scan → project → TakeOrdered(50) →
    50-row rerank: zero shuffles, and at 100 TB the scan reads 8-byte
    sketches instead of 256-byte vectors until the rerank touches 50
    rows. Fully value-oracled from the literal query vector — shortlist
    membership, Hamming values, and rerank scores all recomputed by
    DuckDB."""
    from ..functions.vectors import cosine_similarity, literal_vector
    from .vectors import _IVF_QV

    e = load_table(spark, sf_dir, "embeddings")
    qlit = literal_vector(_IVF_QV)
    mism = F.zip_with(
        F.col("embedding"), qlit,
        lambda x, y: F.when(
            (x.cast("double") > 0) != (y > 0), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    scored = e.select(
        "vec_id",
        "embedding",
        F.aggregate(mism, F.lit(0), lambda a, x: a + x).cast("int").alias("hamming"),
    )
    short = scored.orderBy("hamming", "vec_id").limit(_SKETCH_SHORTLIST)
    return (
        short.select(
            "vec_id",
            "hamming",
            F.round(cosine_similarity(F.col("embedding"), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


def _capture_recapture_oracle(planes: list[list[float]], threshold: float,
                              max_bucket: int) -> str:
    half = len(planes) // 2
    a = _bucketed_embedding_oracle(planes[:half], 2, threshold,
                                   max_bucket=max_bucket)
    b = _bucketed_embedding_oracle(planes[half:], 2, threshold,
                                   max_bucket=max_bucket)
    return f"""
    WITH sa AS ({a}), sb AS ({b}),
    m AS (
      SELECT CAST((SELECT COUNT(*) FROM sa) AS BIGINT) AS n_a,
             CAST((SELECT COUNT(*) FROM sb) AS BIGINT) AS n_b,
             CAST((SELECT COUNT(*) FROM sa JOIN sb
                   ON sa.id_a = sb.id_a AND sa.id_b = sb.id_b) AS BIGINT)
               AS n_both
    )
    SELECT n_a, n_b, n_both,
           ROUND(CAST(n_a * n_b AS DOUBLE) / NULLIF(n_both, 0), 2)
             AS est_total_pairs,
           ROUND(CAST(n_both AS DOUBLE) / NULLIF(n_b, 0), 6) AS recall_a_hat,
           ROUND(CAST(n_both AS DOUBLE) / NULLIF(n_a, 0), 6) AS recall_b_hat
    FROM m
    """


@query(
    "dedup_capture_recapture_estimate",
    oracle=_capture_recapture_oracle(_DEDUP_PLANES, 0.4, _DEDUP_MAX_BUCKET),
)
def dedup_capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE–RECAPTURE (Lincoln–Petersen) ESTIMATE OF TOTAL NEAR-DUP
    PAIRS — the audit that sizes the dup problem WITHOUT the exact O(n²)
    join a 100 TB corpus can't afford: run the banded detector twice on
    DISJOINT plane halves (two independent 2×16-bit samples of the same
    pair population), and estimate the true pair count as
    N̂ = n_A·n_B / |A∩B| — the two-sample mark-recapture formula; each
    sample's recall falls out as |A∩B|/n_other. CAVEAT, stated because
    the test corpus exhibits it: Lincoln–Petersen assumes HOMOGENEOUS
    catchability, and LSH detection probability rises with cosine, so on
    a corpus whose "pairs" span a wide similarity range (the uniform
    test embeddings: cos 0.4–0.6) the correlated detectors make N̂ a
    LOWER bound (15·10/3 = 50 vs 920 true at sf0.1) — the estimator is
    consistent in the NEAR-DUP regime it exists for, where every true
    pair is near-certainly caught per band (certified on a planted
    homogeneous cluster in tests/test_round11_ops.py). Both samples ride
    the standard capped band join (anchor-star heavy buckets); the
    overlap is one pair-keyed equi-join of two SMALL verified-pair
    tables; the oracle recomputes both detectors and the estimate from
    the identical literal plane halves."""
    e = load_table(spark, sf_dir, "embeddings")
    half = len(_DEDUP_PLANES) // 2
    # r13: each detector's verified-pair table feeds TWO consumers (the
    # overlap join and its own count); materialize the OUTPUT-sized pair
    # lists once so the capped band join + verify doesn't run twice per
    # side (guide §2.4; measured 4.25 s → see OPTIMIZATION_r13.md)
    #
    # r13 (late): the two detectors need disjoint PLANES, not disjoint
    # SCANS — the full plane-dot array is computed ONCE behind one
    # exchange+checkpoint and each detector reads its half as an array
    # slice (identical values: plane_dots is per-plane independent), so
    # the embeddings scan + literal-matrix evaluation run once per query
    # instead of once per detector (guide §2.4; VERDICT r12 item 6).
    from ..operators.similarity import plane_dots
    from ..functions.vectors import norm

    shared = (
        e.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("v"),
            norm("embedding").alias("nrm"),
            plane_dots("embedding", _DEDUP_PLANES).alias("__pd_all"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    base_a = shared.select(
        "id", "v", "nrm", F.slice("__pd_all", 1, half).alias("__pd")
    )
    base_b = shared.select(
        "id", "v", "nrm", F.slice("__pd_all", half + 1, half).alias("__pd")
    )
    pa = dedup.embedding_near_pairs_bucketed(
        e, "embedding", "vec_id", _DEDUP_PLANES[:half], threshold=0.4,
        bands=2, max_bucket=_DEDUP_MAX_BUCKET, base=base_a,
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    pb = dedup.embedding_near_pairs_bucketed(
        e, "embedding", "vec_id", _DEDUP_PLANES[half:], threshold=0.4,
        bands=2, max_bucket=_DEDUP_MAX_BUCKET, base=base_b,
    ).select(
        F.col("id_a").alias("b_a"), F.col("id_b").alias("b_b")
    ).localCheckpoint(eager=False)
    both = pa.join(
        pb, (pa["id_a"] == pb["b_a"]) & (pa["id_b"] == pb["b_b"])
    )
    na = pa.agg(F.count("*").cast("bigint").alias("n_a"))
    nb = pb.agg(F.count("*").cast("bigint").alias("n_b"))
    nboth = both.agg(F.count("*").cast("bigint").alias("n_both"))
    m = na.crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nboth))
    return m.select(
        "n_a", "n_b", "n_both",
        F.round(
            (F.col("n_a") * F.col("n_b")).cast("double")
            / F.nullif(F.col("n_both"), F.lit(0)),
            2,
        ).alias("est_total_pairs"),
        F.round(
            F.col("n_both").cast("double") / F.nullif(F.col("n_b"), F.lit(0)), 6
        ).alias("recall_a_hat"),
        F.round(
            F.col("n_both").cast("double") / F.nullif(F.col("n_a"), F.lit(0)), 6
        ).alias("recall_b_hat"),
    )
