"""Corpus-quality, retrieval, and span-dedup queries over ``documents``.

Round-3 additions to the LLM-pipeline surface: the Gopher rule battery,
unigram-LM scoring, BM25 retrieval, and substring-level (repeated-span)
duplication — each with a value-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import quality, search, spans
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
