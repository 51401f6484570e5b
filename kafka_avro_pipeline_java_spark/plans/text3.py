"""Bigram-LM scoring, feature-hashed embeddings (text→vector bridge), and
the cross-source span-overlap matrix.

The hash-embedding + SemDeDup composition is the end-to-end story the
vector operators exist for: documents in, near-duplicate survivors out,
with no external embedding model — every stage oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import portable_hash64
from ..functions.vectors import lcg_planes
from ..operators import semdedup, spans
from ..sources import load_table
from .registry import query

_HASH_DIM = 32


def hash_embedding(text_col, dim: int = _HASH_DIM):
    """Feature-hashed bag-of-words document vector (array<double>, length
    ``dim``): bucket b counts the tokens whose portable hash lands on b.
    No vocabulary, no model, fully deterministic and engine-portable — the
    classic hashing-trick featurizer. One projection, zero shuffles.

    The md5 is folded over the token list ONCE (an `aggregate` building the
    histogram), not once per (bucket, token): lambdas get no subexpression
    elimination, so the naive per-bucket `filter` re-hashes every token
    dim times — measured 30 CPU-cores pinned on a 100k-doc corpus pass.
    Histogram update is O(dim) per token in interpreted ops but ZERO
    hashing; values are identical to the per-bucket-count definition the
    DuckDB oracle uses (fine for small dim; a corpus pass at large dim
    would pivot on an exploded (doc, bucket) count instead)."""
    toks = T.tokens(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))
    # hash each token exactly once; the histogram fold then only compares
    # the already-computed bucket id against the index
    hashes = F.transform(toks, lambda t: F.pmod(portable_hash64(t), F.lit(dim)))
    zeros = F.array_repeat(F.lit(0.0), dim)
    return F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.transform(
            acc, lambda x, i: x + F.when(i.cast("bigint") == h, 1.0).otherwise(0.0)
        ),
    )


def hash_embedding_df(
    df, text_col: str, id_col: str, dim: int = _HASH_DIM
):
    """(id, emb) via the exploded word-count shape: hash each token once,
    explode to (id, bucket), count, and re-assemble the dense array from a
    per-doc map. Two keyed aggs (both map-side-combinable) instead of the
    interpreted O(dim)-per-token histogram fold — measured 1.9 s vs 4.5 s
    for the corpus pass at sf0.1, value-identical — and the shape that
    holds at ANY dim (the fold's per-token work grows with dim; this
    grows with tokens only). Use the expression form ``hash_embedding``
    when the vector is consumed inside one projection; use this when the
    embedding pass IS the job (SemDeDup e2e)."""
    toks = T.tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.pmod(portable_hash64(t), F.lit(dim)))
    ex = df.select(F.col(id_col).alias("id"), F.explode(hashes).alias("b"))
    cnt = ex.groupBy("id", "b").agg(F.count("*").cast("double").alias("c"))
    m = cnt.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m")
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at("m", i.cast("bigint")), F.lit(0.0)
        ),
    )
    return m.select("id", emb.alias("emb"))


_HASH_EMB_SQL = f"""list_transform(range(0, {_HASH_DIM}),
               b -> CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % {_HASH_DIM} = b)) AS DOUBLE))"""


@query(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), bigr AS (
      SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ts))) AS i(i)
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c_ab FROM bigr GROUP BY w1, w2
    ), hc AS (
      SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c_a FROM bigr GROUP BY w1
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
           ROUND(AVG(LN(c_ab / c_a)), 4) AS mean_bigram_logprob
    FROM bigr JOIN bc USING (w1, w2) JOIN hc USING (w1)
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean log P(w_i | w_{i-1}) under the corpus bigram LM — the stronger
    perplexity-flavored quality signal (catches scrambled/boilerplate word
    order that the unigram score can't). Conditional MLE c(ab)/c(a·); every
    doc bigram exists in the corpus counts by construction, so no OOV or
    smoothing term. Bigram/history counts are word-count-shaped aggregates;
    the score join is a shuffle equi-join on the bigram key (the bigram
    table outgrows broadcast at corpus scale), then one per-doc mean."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.lower(F.col("text"))).alias("ts"))
    toks = toks.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    bigr = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i).alias("w1"),
                        F.element_at("ts", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    # r13: one corpus aggregation instead of three — the history counts
    # roll up from the materialized bigram-type table (Σ_b c(ab) = c(a·),
    # identical values), and the word-type-scale checkpoint serves the
    # rollup and the score join (the same AQE-broadcast reuse failure and
    # fix as text_kneser_ney_bigram; A/B in OPTIMIZATION_r13.md)
    bc = bigr.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c_ab")
    ).localCheckpoint(eager=False)
    hc = bc.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    return (
        bigr.join(bc, ["w1", "w2"]).join(hc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c_ab") / F.col("c_a"))), 4).alias(
                "mean_bigram_logprob"
            ),
        )
    )


@query(
    "text_hash_embedding",
    oracle=f"""
    WITH emb0 AS (
      SELECT doc_id, {_HASH_EMB_SQL} AS emb
      FROM documents
    )
    SELECT doc_id, CAST(i.i AS INT) AS dim, emb[i.i + 1] AS value
    FROM emb0, UNNEST(range(0, {_HASH_DIM})) AS i(i)
    """,
)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed 32-dim bag-of-words vector per document — the
    no-model text→vector bridge (hashing trick) — emitted in the exploded
    long shape ``(doc_id, dim, value)`` (one row per vector component)
    rather than as a nested ``array<double>`` column: the harness
    canonicalizes results through pandas, which cannot factorize list
    cells, so every registered query keeps a flat scalar schema. Values
    are compared component-for-component (500 docs × 32 dims at the
    driver SF); consumers that want the dense vector use the
    ``hash_embedding`` expression directly (as the SemDeDup e2e does)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(hash_embedding("text")).alias("dim", "value"),
    )


# Literal centroids for the text e2e: k≈√n for the 500–5000-doc driver
# tables, SIGNED (the pipeline mean-centers the hashed counts first —
# raw bag-of-words vectors live in the all-positive orthant, cosines
# concentrate near 1 and clusters collapse; measured 61 s at 5k docs vs
# ~5 s centered. Counts are integer-valued doubles, so the per-component
# mean is bit-identical across engines regardless of summation order).
_TXT_K = 24
_TXT_CENTS = lcg_planes(_TXT_K, _HASH_DIM, seed=21)
_TXT_THRESHOLD = 0.8


def _pynorm(v: list[float]) -> float:
    import math

    return math.sqrt(sum(x * x for x in v))


def _text_semdedup_oracle(cents: list[list[float]], threshold: float) -> str:
    nc = [_pynorm(c) for c in cents]
    n = len(cents)
    dot_cols = ",\n             ".join(
        f"SUM(emb[i.i] * ([{', '.join(repr(x) for x in c)}])[i.i]) AS d{j}"
        for j, c in enumerate(cents)
    )
    sim_cols = ",\n           ".join(
        f"d{j} / (SQRT(nsq) * {nc[j]!r}) AS s{j}" for j in range(n)
    )
    first_max = " ".join(f"WHEN s{j} = mx THEN {j}" for j in range(n))
    dim = len(cents[0])
    centered_list = "[" + ", ".join(
        f"raw.emb[{i + 1}] - m.m{i}" for i in range(dim)
    ) + "]"
    mean_cols = ", ".join(f"AVG(emb[{i + 1}]) AS m{i}" for i in range(dim))
    return f"""
    WITH emb0 AS (
      SELECT doc_id, {_HASH_EMB_SQL} AS emb
      FROM documents
    ), raw AS (
      SELECT doc_id, emb FROM emb0
      WHERE len(list_filter(emb, x -> x <> 0)) > 0
    ), m AS (
      SELECT {mean_cols} FROM raw
    ), emb AS (
      SELECT doc_id, {centered_list} AS emb FROM raw, m
    ), dots AS (
      SELECT doc_id,
             {dot_cols},
             SUM(emb[i.i] * emb[i.i]) AS nsq
      FROM emb, UNNEST(range(1, len(emb) + 1)) AS i(i)
      GROUP BY doc_id
    ), sims AS (
      SELECT doc_id, SQRT(nsq) AS nrm,
           {sim_cols}
      FROM dots
    ), assigned AS (
      SELECT doc_id, nrm,
             CASE {first_max} END AS cid
      FROM (SELECT *, GREATEST({', '.join(f's{j}' for j in range(n))}) AS mx FROM sims)
    ), pairs AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.doc_id < b.doc_id
    ), pd AS (
      SELECT p.ia, p.ib,
             SUM(ea.emb[i.i] * eb.emb[i.i]) AS dp
      FROM pairs p
      JOIN emb ea ON ea.doc_id = p.ia
      JOIN emb eb ON eb.doc_id = p.ib,
           UNNEST(range(1, len(ea.emb) + 1)) AS i(i)
      GROUP BY 1, 2
    ), doomed AS (
      SELECT DISTINCT p.ib AS id
      FROM pd p
      JOIN assigned na ON na.doc_id = p.ia
      JOIN assigned nb ON nb.doc_id = p.ib
      WHERE ROUND(p.dp / (na.nrm * nb.nrm), 6) >= {threshold}
    )
    SELECT doc_id, CAST(cid AS INT) AS cid FROM assigned
    WHERE doc_id NOT IN (SELECT id FROM doomed)
    """


@query(
    "dedup_semantic_text_e2e",
    oracle=_text_semdedup_oracle(_TXT_CENTS, _TXT_THRESHOLD),
)
def dedup_semantic_text_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup FROM RAW TEXT: feature-hash each document
    into a 32-dim vector, MEAN-CENTER (the step that keeps clusters
    balanced — see _TXT_CENTS note), then SemDeDup keep-one over 24 literal
    centroids at centered-cosine ≥ 0.8 — documents in, survivors out, no
    external embedding model, every stage of the composition
    oracle-checked. Zero-token docs (all-zero hashed vector) are excluded
    before centering — cosine is undefined for them and they carry no
    dedupable content. The mean is a 1-row broadcast aggregate."""
    d = load_table(spark, sf_dir, "documents")
    # raw is materialized once (lazy localCheckpoint): the mean aggregate
    # and the centered projection both consume it, and semantic_dedup's
    # own materialization sits downstream of the centering — without this
    # cut the tokenize→feature-hash pipeline ran twice (r13)
    raw = (
        hash_embedding_df(d, "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .filter(F.exists("emb", lambda x: x != 0))
    ).localCheckpoint(eager=False)
    means = raw.agg(
        *[F.avg(F.element_at("emb", i + 1)).alias(f"m{i}") for i in range(_HASH_DIM)]
    )
    mean_arr = F.array(*[F.col(f"m{i}") for i in range(_HASH_DIM)])
    centered = raw.crossJoin(F.broadcast(means)).select(
        "doc_id", F.zip_with("emb", mean_arr, lambda x, mval: x - mval).alias("emb")
    )
    return semdedup.semantic_dedup(
        centered, "emb", "doc_id", _TXT_CENTS, _TXT_THRESHOLD
    ).withColumnRenamed("id", "doc_id")


@query(
    "pipeline_source_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), spans AS (
      SELECT DISTINCT source,
             substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS INT) AS shared_spans
    FROM spans a JOIN spans b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def pipeline_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    distinct 5-token spans they share — the corpus-QA view that locates
    WHICH ingestion feeds duplicate boilerplate into each other (drives
    dedup priorities and mixture corrections). Span hashes distinct per
    source (one keyed shuffle), then a self-equi-join on the hash whose
    per-key fan-out is bounded by the SOURCE count, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    sp = spans.span_table(d, "text", "doc_id", w=5)
    # r14: the old self-equi-join on span_hash derived the (source, hash)
    # table TWICE (two corpus tokenize passes) and shuffled it twice more.
    # One span_hash-keyed collect_set (map-side set union — the distinct
    # is subsumed) followed by an in-row combination explode yields the
    # identical per-pair distinct-hash counts: each hash contributes
    # exactly one (a, b) row per source pair in its set, a < b by the
    # same binary string order as the join's filter (§2.3/§2.4). Per-hash
    # state is bounded by the SOURCE count, not the corpus.
    srcs = (
        sp.join(d.select(F.col("doc_id").alias("id"), "source"), "id")
        .groupBy("span_hash")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
    )
    ss = F.col("ss")
    combos = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(
                    ss, i + F.lit(2),
                    F.greatest(F.size(ss) - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        srcs.select(F.explode(combos).alias("p"))
        .select(
            F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b")
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("int").alias("shared_spans"))
    )


@query(
    "pipeline_split_drift",
    oracle="""
    WITH labeled AS (
      SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
             tok
      FROM (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b,
               t.tok
        FROM documents,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      )
    ), counts AS (
      SELECT split, tok, CAST(COUNT(*) AS DOUBLE) AS c FROM labeled GROUP BY 1, 2
    ), totals AS (
      SELECT split, SUM(c) AS n FROM counts GROUP BY 1
    ), vocab AS (
      SELECT DISTINCT tok FROM counts
    ), vsize AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM vocab
    ), grid AS (
      SELECT s.split, v.tok, COALESCE(c.c, 0) AS c, t.n, z.v
      FROM (SELECT DISTINCT split FROM totals) s
      CROSS JOIN vocab v
      LEFT JOIN counts c ON c.split = s.split AND c.tok = v.tok
      JOIN totals t ON t.split = s.split, vsize z
    ), p AS (
      SELECT split, tok, (c + 1) / (n + v) AS p FROM grid
    )
    SELECT a.split, ROUND(SUM(a.p * LN(a.p / b.p)), 6) AS kl_vs_train
    FROM p a JOIN p b ON b.tok = a.tok AND b.split = 'train'
    WHERE a.split <> 'train'
    GROUP BY a.split
    """,
)
def pipeline_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift between corpus splits: add-one-smoothed
    KL(split ‖ train) over the full shared vocabulary, for the val and
    test splits of the deterministic hash split (pipeline_corpus_split's
    exact bucketing). The split-QA gate a training pipeline runs before
    trusting held-out metrics — a drifted split means leakage or skew in
    the splitter. Word-count-shaped aggregates + one vocab-sized grid
    join; output is one row per non-train split."""
    from ..functions.hashing import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    bucket = F.pmod(portable_hash64(F.col("doc_id").cast("string")), F.lit(100))
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    labeled = d.select(
        split.alias("split"),
        F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"),
    )
    # r13: the (split, tok) count table feeds totals, the vocab domain and
    # the smoothing grid — materialize the word-type-scale table once
    # instead of re-running the corpus tokenize+explode per consumer
    counts = labeled.groupBy("split", "tok").agg(
        F.count("*").cast("double").alias("c")
    ).localCheckpoint(eager=False)
    totals = counts.groupBy("split").agg(F.sum("c").alias("n"))
    vocab = counts.select("tok").distinct()
    vsize = vocab.agg(F.count("*").cast("double").alias("v"))
    grid = (
        totals.crossJoin(vocab)
        .join(counts, ["split", "tok"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "split", "tok",
            ((F.coalesce("c", F.lit(0.0)) + 1) / (F.col("n") + F.col("v"))).alias("p"),
        )
    )
    train = grid.filter(F.col("split") == "train").select(
        "tok", F.col("p").alias("q")
    )
    return (
        grid.filter(F.col("split") != "train")
        .join(train, "tok")
        .groupBy("split")
        .agg(F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl_vs_train"))
    )


@query(
    "dedup_span_scrub",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), spans AS (
      SELECT doc_id, i.i AS pos,
             substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    ), dup AS (
      SELECT h FROM spans GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)
    ), covered AS (
      SELECT DISTINCT s.doc_id, s.pos + j.j AS tok_pos
      FROM spans s JOIN dup USING (h), UNNEST(range(0, 5)) AS j(j)
    ), kept AS (
      SELECT t.doc_id, i.i AS tok_pos, ts[i.i] AS tok
      FROM toks t, UNNEST(range(1, len(ts) + 1)) AS i(i)
      WHERE NOT EXISTS (SELECT 1 FROM covered c
                        WHERE c.doc_id = t.doc_id AND c.tok_pos = i.i)
    )
    SELECT k.doc_id,
           string_agg(k.tok, ' ' ORDER BY k.tok_pos) AS scrubbed,
           CAST(len(t.ts) AS INT) AS n_tokens,
           CAST(len(t.ts) - COUNT(*) AS INT) AS n_removed
    FROM kept k JOIN toks t USING (doc_id)
    GROUP BY k.doc_id, len(t.ts)
    """,
)
def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup, REMOVE half: delete every token position
    covered by a cross-doc duplicated 5-token span and rebuild the
    document from the survivors (operators/spans.py::scrub_spans) —
    boilerplate vanishes from every copy while unique content stays.
    Output is the normalized rebuilt text + removal counts. Docs whose
    every token is covered drop out entirely (fully-boilerplate docs)."""
    d = load_table(spark, sf_dir, "documents")
    return spans.scrub_spans(d, "text", "doc_id", w=5).withColumnRenamed(
        "id", "doc_id"
    )
