"""Corpus-quality, retrieval, and span-dedup queries over ``documents``.

Round-3 additions to the LLM-pipeline surface: the Gopher rule battery,
unigram-LM scoring, BM25 retrieval, and substring-level (repeated-span)
duplication — each with a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators import dedup, quality, search, spans
from ..sources import load_table
from .registry import query

_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in quality.GOPHER_STOPWORDS)

# BM25 query literal: frequent corpus terms (so scores exercise the tf and
# length-normalization terms, not just idf of rare words).
BM25_TERMS = ["query", "window", "scan", "merge", "sort"]
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_words,
             ROUND(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE),
                   4) AS mean_word_len,
             ROUND(((length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '...', ''))) / 3.0)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE),
                   4) AS symbol_ratio,
             ROUND(len(list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(trim(l), '^([*-]|•)')))
                   / CAST(len(string_split(text, chr(10))) AS DOUBLE), 4)
               AS bullet_frac,
             ROUND(len(list_filter(string_split(text, chr(10)),
                                   l -> trim(l) LIKE '%...'))
                   / CAST(len(string_split(text, chr(10))) AS DOUBLE), 4)
               AS ellipsis_frac,
             ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   t -> regexp_matches(t, '[a-zA-Z]')))
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE),
                   4) AS alpha_frac,
             CAST(len(list_intersect(
                    list_distinct(string_split_regex(trim(lower(text)), '\\s+')),
                    [{_GOPHER_STOP_SQL}])) AS INT) AS stop_hits
      FROM documents
    )
    SELECT *,
           CASE WHEN n_words BETWEEN {quality.MIN_WORDS} AND {quality.MAX_WORDS}
                 AND mean_word_len BETWEEN {quality.MIN_MEAN_WORD_LEN}
                                       AND {quality.MAX_MEAN_WORD_LEN}
                 AND symbol_ratio <= {quality.MAX_SYMBOL_RATIO}
                 AND bullet_frac <= {quality.MAX_BULLET_FRAC}
                 AND ellipsis_frac <= {quality.MAX_ELLIPSIS_FRAC}
                 AND alpha_frac >= {quality.MIN_ALPHA_FRAC}
                 AND stop_hits >= {quality.MIN_STOP_HITS}
                THEN 1 ELSE 0 END AS passes_gopher
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher (Rae et al. 2021, A1.1) quality-rule battery: per-doc
    metrics + the conjunction gate, as one scan→project of codegen
    expressions (operators/quality.py). Zero shuffles — the 100 TB plan is
    a pure map over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return quality.gopher_rules(d, "text", "doc_id")


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), vocab AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vocab
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens,
           ROUND(AVG(LN(cnt / n_total)), 4) AS mean_logprob
    FROM toks JOIN vocab USING (tok), tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token log-probability under the corpus's own unigram LM — the
    cheap perplexity-flavored quality signal (operators/quality.py). Vocab
    fit + score join + per-doc mean: three keyed shuffles, no broadcast of
    the vocabulary (it outgrows broadcast thresholds at corpus scale)."""
    d = load_table(spark, sf_dir, "documents")
    return quality.unigram_logprob(d, "text", "doc_id").withColumnRenamed(
        "id", "doc_id"
    )


@query(
    "text_bm25_search",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), lengths AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs
    ), hits AS (
      SELECT doc_id, t.tok FROM docs, UNNEST(toks) AS t(tok)
      WHERE t.tok IN ({_BM25_TERMS_SQL})
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM hits GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df_t FROM tf GROUP BY tok
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lengths
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_hit_terms,
           ROUND(SUM(LN(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
    FROM tf JOIN dfreq USING (tok) JOIN lengths USING (doc_id), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a literal bag-of-words query (operators/search.py):
    term-filtered explode → tf/df aggregates → broadcast stats → keyed sum
    → TakeOrdered. k1=1.2, b=0.75 (Lucene idf form)."""
    d = load_table(spark, sf_dir, "documents")
    return search.bm25_topk(
        spark, d, "text", "doc_id", BM25_TERMS, k=10
    ).withColumnRenamed("id", "doc_id")


@query(
    "dedup_repeated_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), spans AS (
      SELECT doc_id, i.i AS pos,
             substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    ), marked AS (
      SELECT doc_id,
             CASE WHEN MIN(doc_id) OVER (PARTITION BY h)
                   <> MAX(doc_id) OVER (PARTITION BY h)
                  THEN 1 ELSE 0 END AS is_dup
      FROM spans
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_spans,
           CAST(SUM(is_dup) AS INT) AS n_dup_spans,
           ROUND(SUM(is_dup) / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac
    FROM marked GROUP BY doc_id
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile: every 5-token window hashed,
    windows occurring in >=2 distinct docs flagged, per-doc coverage
    reported (operators/spans.py — the Lee et al. 2022 span-dedup measure;
    a pipeline drops or masks above a dup_frac threshold)."""
    d = load_table(spark, sf_dir, "documents")
    return spans.span_dup_stats(d, "text", "doc_id", w=5).withColumnRenamed(
        "id", "doc_id"
    )


@query(
    "pipeline_decontaminate_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), spans AS (
      SELECT doc_id,
             substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    ), bench AS (
      SELECT DISTINCT h FROM spans WHERE doc_id % 97 = 0
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_overlap_spans
    FROM spans
    WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM bench)
    GROUP BY doc_id
    """,
)
def pipeline_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-overlap decontamination (GPT-3 style, 5-token spans): flag
    training docs sharing ANY span with the eval set (doc_id % 97 == 0
    stands in). Stricter than the whole-doc fingerprint variant
    (pipeline_decontaminate) — catches partial quotation. Eval span hashes
    broadcast; corpus side never shuffles for the check
    (operators/spans.py::ngram_decontaminate)."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    return spans.ngram_decontaminate(
        d, "text", "doc_id", F.col("doc_id") % 97 == 0, w=5
    ).withColumnRenamed("id", "doc_id")


@query(
    "pipeline_importance_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             ROUND(0.5 * LEAST(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0)
                   + 0.5 * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                                  / CAST(length(text) AS DOUBLE)), 4) AS weight,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000)
               / 10000.0 AS draw
      FROM documents
    )
    SELECT doc_id, weight FROM w WHERE draw < weight
    """,
)
def pipeline_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling: each doc kept with probability equal to
    its quality score, via the portable md5 draw — deterministic across
    runs and engines, zero shuffles (operators/quality.py). The data-mixing
    primitive for up-weighting high-quality sources without a global
    sort or sampling state."""
    d = load_table(spark, sf_dir, "documents")
    return quality.importance_sample(d, "text", "doc_id")


@query(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM toks GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS d FROM tf GROUP BY tok
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
      SELECT doc_id, tok, ROUND(c * LN(n_docs / d), 4) AS tfidf
      FROM tf JOIN dfreq USING (tok), n
    )
    SELECT doc_id, tok, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, tok) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by tf-idf — keyword extraction for
    corpus exploration and topic tagging. tf/df are word-count-shaped
    aggregates; the df join is a shuffle equi-join on the token (the df
    table is vocabulary-sized — too big to broadcast at corpus scale);
    per-doc top-3 is a keyed window, no global sort. Ties break on the
    token so the selected set is engine-independent."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    # repartition before the explode: a single-file source would tokenize
    # the whole corpus in one task
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("double").alias("c"))
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("d"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "tok",
            F.round(F.col("c") * F.log(F.col("n_docs") / F.col("d")), 4).alias("tfidf"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "text_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), uni AS (
      SELECT t.tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM toks, UNNEST(ts) AS t(tok) GROUP BY t.tok
    ), bi AS (
      SELECT ts[i.i] AS w1, ts[i.i + 1] AS w2, CAST(COUNT(*) AS DOUBLE) AS c_ab
      FROM toks, UNNEST(range(1, len(ts))) AS i(i)
      GROUP BY 1, 2
    ), totals AS (
      SELECT (SELECT SUM(c) FROM uni) AS nt, (SELECT SUM(c_ab) FROM bi) AS nb
    )
    SELECT w1, w2, CAST(c_ab AS INT) AS n_pair,
           ROUND(LN((c_ab / nb) / ((a.c / nt) * (b.c / nt))), 4) AS pmi
    FROM bi JOIN uni a ON a.tok = w1 JOIN uni b ON b.tok = w2, totals
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations (adjacent-pair PMI with a count floor) — the
    phrase-mining pass for tokenizer/vocabulary construction. Bigrams come
    from one posexplode over the materialized token array; unigram and
    bigram counts are word-count aggregates; totals broadcast; final top-20
    is TakeOrdered on the rounded PMI with (w1, w2) tiebreak."""
    from pyspark.sql import functions as F

    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(T.tokens(F.lower(F.col("text"))).alias("ts"))
    # spread the explode/shingle work — a single-file source would run it
    # in one task (same rule as operators/dedup.py::shingle_table)
    toks = toks.repartition(spark.sparkContext.defaultParallelism)
    # r13: uni feeds the total + BOTH endpoint joins, bi feeds the total +
    # the PMI scoring — the word-/bigram-type count tables are
    # materialized once so the corpus explodes run once each (the same
    # AQE-broadcast exchange-reuse failure as text_kneser_ney_bigram)
    uni = toks.select(F.explode("ts").alias("tok")).groupBy("tok").agg(
        F.count("*").cast("double").alias("c")
    ).localCheckpoint(eager=False)
    pairs = toks.select(
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
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c_ab")
    ).localCheckpoint(eager=False)
    totals = uni.agg(F.sum("c").alias("nt")).crossJoin(
        bi.agg(F.sum("c_ab").alias("nb"))
    )
    a = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    return (
        bi.filter(F.col("c_ab") >= 5)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", F.col("c_ab").cast("int").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("nb"))
                    / ((F.col("c_a") / F.col("nt")) * (F.col("c_b") / F.col("nt")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), lengths AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs
    ), hits AS (
      SELECT doc_id, t.tok FROM docs, UNNEST(toks) AS t(tok)
      WHERE t.tok IN ({_BM25_TERMS_SQL})
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM hits GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df_t FROM tf GROUP BY tok
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lengths
    ), bm_top AS (
      SELECT doc_id,
             ROUND(SUM(LN(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
      FROM tf JOIN dfreq USING (tok) JOIN lengths USING (doc_id), stats
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 20
    ), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cos_scored AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS dp,
             SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)) AS na,
             SUM(CAST(q.qv[i.i] AS DOUBLE) * CAST(q.qv[i.i] AS DOUBLE)) AS nb
      FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS i(i)
      GROUP BY e.vec_id
    ), cos_top AS (
      SELECT vec_id AS doc_id, ROUND(dp / (SQRT(na) * SQRT(nb)), 6) AS cos_sim
      FROM cos_scored ORDER BY cos_sim DESC, vec_id LIMIT 20
    ), bmr AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank_bm
      FROM bm_top
    ), cosr AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rank_cos
      FROM cos_top
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           CAST(COALESCE(rank_bm, 0) AS INT) AS bm25_rank,
           CAST(COALESCE(rank_cos, 0) AS INT) AS cos_rank,
           ROUND(COALESCE(1.0 / (60 + rank_bm), 0)
                 + COALESCE(1.0 / (60 + rank_cos), 0), 6) AS rrf
    FROM bmr b FULL OUTER JOIN cosr c USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 (inverted-index branch) fused with
    cosine top-20 to the vec_id=0 embedding (dense branch, doc_id ≡
    vec_id) by reciprocal-rank fusion (operators/search.py::rrf_fuse).
    Each branch does its distributed work and emits 20 rows; the fusion
    joins two bounded lists — RRF's robustness to incomparable score
    scales is why it is the default first fusion in RAG/retrieval stacks."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bm = search.bm25_topk(spark, d, "text", "doc_id", BM25_TERMS, k=20).select(
        "id", "bm25"
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    )
    cos = (
        e.crossJoin(q)
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine_similarity(F.col("embedding"), F.col("q")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("id"))
        .limit(20)
    )
    fused = search.rrf_fuse([(bm, "bm25"), (cos, "cos_sim")], "id", c=60, k=10)
    return fused.select(
        F.col("id").alias("doc_id"),
        F.col("rank_0").alias("bm25_rank"),
        F.col("rank_1").alias("cos_rank"),
        "rrf",
    )


@query(
    "dedup_containment_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             ts[i.i] || ' ' || ts[i.i + 1] || ' ' || ts[i.i + 2] AS shingle
      FROM tok, UNNEST(range(1, len(ts) - 1)) AS i(i)
      WHERE len(ts) >= 3
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           ROUND(i.n_common / CAST(sa.n_sh AS DOUBLE), 4) AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
    WHERE ROUND(i.n_common / CAST(sa.n_sh AS DOUBLE), 4) >= 0.4
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-containment pairs at C(a→b) ≥ 0.4
    (operators/dedup.py::containment_pairs): the asymmetric complement of
    Jaccard dedup — catches a short doc embedded in a long one (quote,
    boilerplate wrapper) that Jaccard scores near zero. Same inverted-index
    equi-join scale shape as dedup_ngram_jaccard."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, "text", "doc_id", k=3, threshold=0.4)


from .registry import ORACLES as _ORACLES2  # noqa: E402  (jaccard registered in text.py)


@query(
    "dedup_golden_record",
    oracle=f"""
    WITH RECURSIVE pairs AS ({{jaccard}}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    walk(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
    m AS (
      SELECT c.component, d.doc_id, d.text, d.lang, d.source, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.id
    ),
    base AS (
      SELECT component,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(MAX(length(text)) AS INT) AS survivor_text_len,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM m GROUP BY 1
    ),
    lp AS (
      SELECT component, lang,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY COUNT(*) DESC, lang) AS rn
      FROM m GROUP BY component, lang
    ),
    sp AS (
      SELECT component, source,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY COUNT(*) DESC, source) AS rn
      FROM m GROUP BY component, source
    )
    SELECT b.component AS entity_id, b.n_members, b.survivor_text_len,
           b.total_chars,
           l.lang AS canonical_lang, s.source AS canonical_source
    FROM base b
    JOIN lp l ON l.component = b.component AND l.rn = 1
    JOIN sp s ON s.component = b.component AND s.rn = 1
    """,
)
def dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution SURVIVORSHIP: near-dup pairs → connected
    components → one synthesized golden record per duplicate cluster.
    Where `dedup_keep_one_e2e` picks a surviving ROW, this resolves each
    ATTRIBUTE independently — longest text length, most-frequent lang and
    source (deterministic count-desc/value-asc tie-break), member count,
    total chars — the master-data-management step after matching.

    Scale shape: all survivorship aggregates are keyed by component
    (cluster-sized groups, never corpus-wide); the attribute-mode picks
    are per-(component, value) counts + a row_number over frames bounded
    by the distinct values inside one cluster. Nothing here exceeds the
    candidate-pair stage that feeds it."""
    from pyspark.sql import Window

    from .graph import _components  # deferred: graph loads after text

    d = load_table(spark, sf_dir, "documents")
    comp = _components(spark, sf_dir)
    # r14: m feeds base + the two attribute-mode tables — three
    # derivations of the components ⋈ documents join. Materialize it ONCE,
    # pruned to the five columns the aggregates read (text collapses to
    # its length here — the full text never needs to be stored; the r13
    # item-10 lesson about TEXT-carrying checkpoints, §2.4).
    m = comp.join(d, comp["id"] == d["doc_id"]).select(
        "component", "lang", "source", "n_chars",
        F.length("text").alias("tl"),
    ).localCheckpoint(eager=False)
    base = m.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.max("tl").cast("int").alias("survivor_text_len"),
        F.sum("n_chars").alias("total_chars"),
    )

    def _mode(col: str, alias: str) -> DataFrame:
        cnt = m.groupBy("component", col).agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("component").orderBy(
            F.col("cnt").desc(), F.col(col).asc()
        )
        return (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("component", F.col(col).alias(alias))
        )

    return (
        base.join(_mode("lang", "canonical_lang"), "component")
        .join(_mode("source", "canonical_source"), "component")
        .select(
            F.col("component").alias("entity_id"),
            "n_members",
            "survivor_text_len",
            "total_chars",
            "canonical_lang",
            "canonical_source",
        )
    )


# splice the jaccard-pair CTE into the oracle now that both are registered
ORACLES = _ORACLES2
ORACLES["dedup_golden_record"] = ORACLES["dedup_golden_record"].replace(
    "{jaccard}", ORACLES["dedup_ngram_jaccard"]
)


@query(
    "text_ndcg_bm25",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), lengths AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs
    ), hits AS (
      SELECT doc_id, t.tok FROM docs, UNNEST(toks) AS t(tok)
      WHERE t.tok IN ({_BM25_TERMS_SQL})
    ), tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM hits GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df_t FROM tf GROUP BY tok
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM lengths
    ), scored AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS rel,
             ROUND(SUM(LN(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
      FROM tf JOIN dfreq USING (tok) JOIN lengths USING (doc_id), stats
      GROUP BY doc_id
    ), actual AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM scored
    ), ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS r
      FROM scored
    ), dcg AS (
      SELECT CAST(SUM(CAST(ROUND((POWER(2.0, rel) - 1.0)
                                 / LOG2(CAST(r + 1 AS DOUBLE))
                                 * 1000000000, 0) AS BIGINT)) AS BIGINT) AS q
      FROM actual WHERE r <= 10
    ), idcg AS (
      SELECT CAST(SUM(CAST(ROUND((POWER(2.0, rel) - 1.0)
                                 / LOG2(CAST(r + 1 AS DOUBLE))
                                 * 1000000000, 0) AS BIGINT)) AS BIGINT) AS q
      FROM ideal WHERE r <= 10
    )
    SELECT ROUND(CAST(dcg.q AS DOUBLE) / 1000000000, 6) AS dcg_10,
           ROUND(CAST(idcg.q AS DOUBLE) / 1000000000, 6) AS idcg_10,
           ROUND(CAST(dcg.q AS DOUBLE) / CAST(idcg.q AS DOUBLE), 6)
             AS ndcg_10
    FROM dcg, idcg
    """,
)
def text_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the BM25 ranking — the search-QUALITY metric on top of
    text_bm25_search's scores: graded relevance = number of distinct
    query terms a document contains (deterministic, so the whole eval is
    a pure function of the corpus), gains 2^rel−1, the ideal ranking by
    relevance, ndcg = DCG/IDCG. This is the eval loop every hybrid-
    retrieval stack (search_hybrid_rrf) runs to justify its fusion
    weights. Each DCG term is 1e9-fixed-point quantized before the
    10-term integer sum (the log2 denominators are the only
    transcendentals); the actual top-10 comes from TakeOrdered on the
    scored table and the ideal top-10 from TakeOrdered on relevance —
    no corpus-sized window anywhere."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    scored = search.bm25_topk(
        spark, d, "text", "doc_id", BM25_TERMS, k=10
    ).withColumnRenamed("id", "doc_id")
    actual = scored.orderBy(F.desc("bm25"), "doc_id").limit(10).select(
        F.col("n_hit_terms").alias("rel"),
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r"),
    )
    # ideal ranking needs relevance over ALL hit docs, not just the BM25
    # top-10: distinct-term counts, then TakeOrdered(10) on relevance
    rel_all = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok").isin(BM25_TERMS))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("rel"))
    )
    ideal = rel_all.orderBy(F.desc("rel"), "doc_id").limit(10).select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.desc("rel"), "doc_id"))
        .alias("r"),
    )

    def dcg_q(df):
        term = F.round(
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2((F.col("r") + 1).cast("double"))
            * 1_000_000_000,
            0,
        ).cast("bigint")
        return df.agg(F.sum(term).cast("bigint").alias("q"))

    dcg = dcg_q(actual).select(F.col("q").alias("dq"))
    idcg = dcg_q(ideal).select(F.col("q").alias("iq"))
    return dcg.crossJoin(idcg).select(
        F.round(F.col("dq").cast("double") / 1_000_000_000, 6).alias("dcg_10"),
        F.round(F.col("iq").cast("double") / 1_000_000_000, 6).alias("idcg_10"),
        F.round(
            F.col("dq").cast("double") / F.col("iq").cast("double"), 6
        ).alias("ndcg_10"),
    )
