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
