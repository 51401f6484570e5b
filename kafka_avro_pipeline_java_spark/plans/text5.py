"""Round-7 text additions: GPT-2-flavored byte-level pre-tokenization.

Byte-level BPE tokenizers (GPT-2 and descendants) don't BPE-merge raw
bytes directly — a regex PRE-tokenizer first splits text into word-ish
chunks with the leading space ATTACHED (" the" and "the" are different
tokens), and merges never cross chunk boundaries. That split is the
corpus-sized distributed step of tokenizer induction (the merge loop over
its output is the bounded-driver part, operators/bpe.py); this query puts
the split itself on the oracle-checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# GPT-2's pattern minus the `\s+(?!\S)` negative lookahead (RE2 — the
# oracle's regex engine — has no lookahead): contractions, space-prefixed
# letter/digit/punctuation runs, then whitespace runs. Alternation is
# leftmost-FIRST in both Java regex and RE2's default mode, so both
# engines chunk identically.
_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
# the pattern itself contains apostrophes → double them for the SQL literal
_PRETOKEN_SQL = _PRETOKEN_RE.replace("'", "''")


@query(
    "text_bytelevel_pretokenize",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(regexp_extract_all(lower(text),
                    '{_PRETOKEN_SQL}', 0)) AS token
      FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok GROUP BY token
    ORDER BY n DESC, token LIMIT 40
    """,
)
def text_bytelevel_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 pre-token chunks with GPT-2's leading-space convention:
    " the" (mid-text) and "the" (document head) count separately, which
    is exactly the asymmetry a byte-level BPE inherits. One
    regexp_extract_all + explode + keyed count — scan-bound, no Python;
    at 100 TB this is the canonical map-side-combine word count with a
    40-row TakeOrdered on top (per-partition top-k, no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(_PRETOKEN_RE), F.lit(0)
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(40)
    )


@query(
    "text_levenshtein_pairs",
    oracle="""
    WITH a AS (
      SELECT doc_id, substr(text, 1, 30) AS p, source
      FROM documents WHERE doc_id < 100
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.p, b.p) AS INT) AS lev30,
           CAST(CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS INT)
             AS same_source
    FROM a JOIN a b ON b.doc_id = a.doc_id + 1
    """,
)
def text_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance over consecutive-id document-prefix pairs — the
    built-in-function twin of dedup_fuzzy_edit's banded Levenshtein
    verifier: ``F.levenshtein`` runs JVM-side (whole-stage codegen, no
    Python), and both engines implement the identical classic DP, so the
    distances value-oracle exactly. Prefix-30 keeps the DP cell count
    bounded per pair regardless of document length, and the id-successor
    self-join is an equi-join on doc_id+1 — no quadratic pair space, the
    scale shape a sampled dup-rate MONITOR uses (score a 1-in-N band of
    adjacent ingest pairs cheaply, alert on drift) as opposed to the full
    LSH dedup path."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.substring("text", 1, 30).alias("pa"),
        F.col("source").alias("sa"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.substring("text", 1, 30).alias("pb"),
        F.col("source").alias("sb"),
    )
    return (
        a.join(b, b.id_b == a.id_a + 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pa", "pb").cast("int").alias("lev30"),
            F.when(F.col("sa") == F.col("sb"), 1).otherwise(0)
            .cast("int").alias("same_source"),
        )
    )


@query(
    "text_word_burstiness",
    oracle="""
    WITH wc AS (
      SELECT doc_id, w AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
      ) WHERE w <> ''
      GROUP BY doc_id, w
    ), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    agg AS (
      SELECT word,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c * c) AS BIGINT) AS sumsq
      FROM wc GROUP BY word
    ), top AS (
      SELECT word, total, df, sumsq FROM agg
      ORDER BY total DESC, word LIMIT 20
    )
    SELECT word, total, df,
           ROUND((CAST(sumsq AS DOUBLE)
                  - 2.0 * total / nd.n * total
                  + CAST(total AS DOUBLE) * total / nd.n)
                 / (nd.n - 1) / (CAST(total AS DOUBLE) / nd.n), 6)
             AS burstiness_vmr
    FROM top, nd
    """,
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word BURSTINESS (variance-to-mean ratio of per-document counts,
    zeros included) for the top-20 corpus words — the classic
    content-vs-function-word separator (function words spread evenly,
    VMR ≈ 1 Poisson-like; topical words clump, VMR >> 1), and the signal
    a stop-word list or tf-idf damping choice is validated against.
    Computed WITHOUT materializing zero cells: with μ = total/n,
    Σ(c−μ)² over all n docs = Σc² − 2μ·total + n·μ² — three exact
    BIGINTs per word (Σc, Σc², df) plus the doc count, one rounded
    division chain. Word-count shape: one (doc, word) groupBy, one
    word-keyed agg, a 20-row TakeOrdered."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    nd = d.agg(F.count("*").cast("bigint").alias("n"))
    agg = wc.groupBy("word").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("df"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
    )
    top = agg.orderBy(F.desc("total"), F.asc("word")).limit(20)
    n = F.col("n")
    total_d = F.col("total").cast("double")
    mean = total_d / n
    var = (
        F.col("sumsq").cast("double")
        - 2.0 * mean * F.col("total")
        + total_d * F.col("total") / n
    ) / (n - 1)
    return top.crossJoin(F.broadcast(nd)).select(
        "word",
        "total",
        "df",
        F.round(var / mean, 6).alias("burstiness_vmr"),
    )


@query(
    "text_kneser_ney_bigram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), bigr AS (
      SELECT doc_id, ts[i.i] AS w1, ts[i.i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ts))) AS i(i)
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c12 FROM bigr GROUP BY w1, w2
    ), hc AS (
      SELECT w1, CAST(SUM(c12) AS DOUBLE) AS c1,
             CAST(COUNT(*) AS DOUBLE) AS n1p
      FROM bc GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(COUNT(*) AS DOUBLE) AS ncont FROM bc GROUP BY w2
    ), types AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS ntypes FROM bc
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bigrams,
           FLOOR(CAST(SUM(CAST(FLOOR(LN(
               (GREATEST(c12 - 0.75, 0.0) + 0.75 * n1p * ncont / ntypes) / c1
             ) * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000000 * 10000 + 0.5) / 10000
             AS mean_kn_logprob
    FROM bigr JOIN bc USING (w1, w2) JOIN hc USING (w1) JOIN cont USING (w2),
         types
    GROUP BY doc_id
    """,
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED KNESER–NEY BIGRAM LM SCORING (Kneser & Ney 1995, the
    smoothing every n-gram LM quality filter actually ships — CCNet's
    perplexity gate is a KN 5-gram): P(w2|w1) = (max(c(w1w2) − D, 0) +
    D·N1+(w1·)·P_cont(w2)) / c(w1·) with absolute discount D = 0.75 and
    the CONTINUATION probability P_cont(w2) = N1+(·w2)/|bigram types| —
    the piece plain MLE (text_bigram_logprob) lacks: it scores how
    PROMISCUOUSLY a word continues contexts, not how often it occurs.
    All inputs are exact integer counts; the one formula is written with
    the identical operation order in both engines, each bigram's log
    term is quantized to a 1e9 BIGINT BEFORE the cross-row sum (the
    house per-term discipline from pipeline_perplexity_filter — a raw
    AVG(LN(...)) is a float sum whose accumulation order differs between
    engines), and the displayed mean uses the FLOOR(x*1e4+0.5)/1e4
    quantizer instead of tie-splitting ROUND. Three word-keyed
    aggregates + the
    score equi-join + a 1-row broadcast of the type count — no new
    shuffle shapes at 100 TB beyond the proven bigram plan."""
    from ..functions import text as T

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
    # r13: the bigram-type count table feeds FOUR consumers (hc, cont,
    # types, the score join); AQE broadcast-converts the three small ones,
    # defeating exchange reuse, so each re-ran the corpus tokenize+explode
    # — materialize the word-type-scale table once (guide §2.4)
    bc = bigr.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c12")
    ).localCheckpoint(eager=False)
    hc = bc.groupBy("w1").agg(
        F.sum("c12").cast("double").alias("c1"),
        F.count("*").cast("double").alias("n1p"),
    )
    cont = bc.groupBy("w2").agg(F.count("*").cast("double").alias("ncont"))
    types = bc.agg(F.count("*").cast("double").alias("ntypes"))
    pkn = (
        F.greatest(F.col("c12") - 0.75, F.lit(0.0))
        + F.lit(0.75) * F.col("n1p") * F.col("ncont") / F.col("ntypes")
    ) / F.col("c1")
    return (
        bigr.join(bc, ["w1", "w2"])
        .join(hc, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (
                F.floor(
                    F.sum(
                        F.floor(F.log(pkn) * 1000000000 + F.lit(0.5)).cast("bigint")
                    ).cast("double")
                    / F.count("*")
                    / 1000000000
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("mean_kn_logprob"),
        )
    )


_TR_D = 0.85          # damping
_TR_ITERS = 6         # unrolled power iterations
_TR_MIN_W = 3         # minimum co-occurrence count for an edge
_TR_BASE = 150_000_000  # (1-d) in 1e9 fixed point


def _textrank_oracle(iters: int = _TR_ITERS, k: int = 20) -> str:
    rs = "".join(
        f"""
    r{i} AS MATERIALIZED (
      SELECT e.dst AS word,
             {_TR_BASE} + CAST(SUM(CAST(FLOOR(
               CAST({_TR_D} AS DOUBLE) * e.w / d.wd * r.r + 0.5)
               AS BIGINT)) AS BIGINT) AS r
      FROM edges e
      JOIN wdeg d ON d.word = e.src
      JOIN r{i - 1} r ON r.word = e.src
      GROUP BY e.dst
    ),"""
        for i in range(1, iters + 1)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), bigr AS (
      SELECT ts[i.i] AS w1, ts[i.i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ts))) AS i(i)
      WHERE ts[i.i] <> ts[i.i + 1]
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigr GROUP BY w1, w2
    ), edges AS MATERIALIZED (
      SELECT w1 AS src, w2 AS dst, c AS w FROM bc WHERE c >= {_TR_MIN_W}
      UNION ALL
      SELECT w2 AS src, w1 AS dst, c AS w FROM bc WHERE c >= {_TR_MIN_W}
    ), wdeg AS MATERIALIZED (
      SELECT src AS word, CAST(SUM(w) AS BIGINT) AS wd FROM edges GROUP BY src
    ), r0 AS (
      SELECT word, CAST(1000000000 AS BIGINT) AS r FROM wdeg
    ),{rs}
    final AS (
      SELECT word, r FROM r{iters}
    )
    SELECT word,
           FLOOR(CAST(r AS DOUBLE) / 1000000000 * 1000000 + 0.5) / 1000000
             AS textrank
    FROM final
    ORDER BY r DESC, word LIMIT {k}
    """


@query("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXTRANK KEYWORD EXTRACTION (Mihalcea & Tarau 2004) — PageRank
    over the word CO-OCCURRENCE graph (adjacent-token edges, weight =
    corpus co-occurrence count, low-support edges pruned):
    the graph-based keyword ranker that beats raw frequency and
    complements text_tfidf_keywords - a word ranks high when it co-occurs
    with other well-connected words, not merely when it is common
    (edges need >= 3 co-occurrences, _TR_MIN_W).
    r(v) = (1-d) + d * sum_u w(u,v)/wdeg(u) * r(u), d=0.85, 6 unrolled
    weighted power iterations, top-20 by score. Cross-engine discipline:
    ranks live in 1e9 fixed point; each edge's contribution is
    FLOOR-quantized to a BIGINT with the identical left-to-right
    expression (d * w / wdeg * r) BEFORE the per-node sum, so both
    engines accumulate identical integers in any order. The damping
    literal is CAST(0.85 AS DOUBLE) in the oracle: DuckDB's bare 0.85
    is DECIMAL(3,2), making 0.85*w EXACT where Spark's float64 path
    already rounded - a one-ulp FLOOR flip on boundary terms (verified:
    w=193, wd=3281, r=1978490850 floors to ...543 decimal vs ...542
    double) — the same
    integer-iteration pattern as graph_pagerank_neardup. Scale shape:
    one corpus scan builds the bigram counts; everything after is
    vocabulary-bounded (Heaps' law) — the edge table is
    localCheckpoint'ed once and each iteration is one keyed
    edge-join + aggregate, never a corpus re-scan."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(T.tokens(F.lower(F.col("text"))).alias("ts"))
    toks = toks.repartition(spark.sparkContext.defaultParallelism)
    bigr = toks.select(
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
        ).alias("p")
    ).select("p.w1", "p.w2").where(F.col("w1") != F.col("w2"))
    bc = bigr.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c"))
    bc = bc.where(F.col("c") >= _TR_MIN_W)
    # r14 (guide §2.4/§3.1): the checkpointed edge table comes back as an
    # ExistingRDD with UnknownPartitioning, so the r13 repartition("src")
    # bought nothing for join planning — every iteration re-shuffled the
    # edges for the rank join AND re-derived the weighted-degree
    # aggregate (ew had 6 consumers). The weighted degree now rides INTO
    # the checkpoint via one window over the same src-keyed exchange, and
    # each iteration broadcast-joins the vocabulary-sized rank vector
    # instead of shuffling the edge table: per iteration one broadcast
    # build + one map-side join + the dst aggregation exchange. Rank
    # vectors are vocabulary-bounded (Heaps' law, further pruned by the
    # c ≥ 3 edge support); at a vocabulary too large to broadcast, drop
    # the hint and this degrades to the shuffled join, same values.
    from pyspark.sql.window import Window as _W

    edges = (
        bc.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), F.col("c").alias("w"))
        .unionByName(
            bc.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), F.col("c").alias("w"))
        )
        .withColumn("wd", F.sum("w").over(_W.partitionBy("src")).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    r = edges.select(F.col("src").alias("word")).distinct().select(
        "word", F.lit(1000000000).cast("bigint").alias("r")
    )
    for _ in range(_TR_ITERS):
        r = (
            edges.join(F.broadcast(r.withColumnRenamed("word", "src")), "src")
            .groupBy("dst")
            .agg(
                (
                    F.lit(_TR_BASE)
                    + F.sum(
                        F.floor(
                            F.lit(_TR_D) * F.col("w") / F.col("wd") * F.col("r")
                            + F.lit(0.5)
                        ).cast("bigint")
                    )
                ).cast("bigint").alias("r")
            )
            .withColumnRenamed("dst", "word")
        )
    return (
        r.orderBy(F.desc("r"), F.asc("word"))
        .limit(20)
        .select(
            "word",
            (
                F.floor(F.col("r").cast("double") / 1000000000 * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("textrank"),
        )
    )
