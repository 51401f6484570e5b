"""Tokenizer-induction queries: BPE over the corpus word table
(operators/bpe.py).

`text_bpe_pair_stats` pins the core statistic (count-weighted adjacent
symbol pairs, the argmax of which IS the merge decision) with a full
DuckDB oracle; the iterative trainer itself is inherently sequential
(driver-side argmax per merge, like k-means updates) and is registered
rows-only with pure-Python-reference parity tests (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bpe
from ..sources import load_table
from .registry import query


@query(
    "text_bpe_pair_stats",
    oracle="""
    WITH wc AS (
      SELECT t.tok AS word, COUNT(*) AS c
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      GROUP BY t.tok
    ), pairs AS (
      SELECT substr(word, i.i, 1) AS a,
             substr(word, i.i + 1, 1)
               || CASE WHEN i.i + 1 = len(word) THEN '</w>' ELSE '' END AS b,
             c
      FROM wc, UNNEST(range(1, len(word))) AS i(i)
    )
    SELECT a, b, CAST(SUM(c) AS BIGINT) AS n
    FROM pairs GROUP BY a, b
    ORDER BY n DESC, a, b LIMIT 20
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 count-weighted adjacent character pairs over the corpus word
    table with the '</w>' word-final marker — iteration one of BPE
    training, whose argmax is the first merge rule. One corpus-sized
    word count, then pair stats over the VOCAB-sized table only (the
    whole reason BPE trains fast at 100 TB)."""
    wc = bpe.word_counts(load_table(spark, sf_dir, "documents"), "text")
    chars = F.split("word", "")
    pairs = wc.select(
        "c",
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.element_at(chars, i).alias("a"),
                        F.when(
                            i + 1 == F.length("word"),
                            F.concat(F.element_at(chars, i + 1), F.lit("</w>")),
                        )
                        .otherwise(F.element_at(chars, i + 1))
                        .alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return (
        pairs.groupBy("p.a", "p.b")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(20)
    )


@query("text_bpe_segment")
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 8 BPE merges on the corpus word table, then segment every
    document with the learned table: (doc_id, n_subwords, subwords).
    Deterministic end to end (lexicographic tiebreaks); parity vs the
    pure-Python reference in tests/test_bpe.py. Rows-only: the trainer's
    per-merge argmax is a driver-side decision the oracle can't unroll
    without replicating the whole training loop."""
    d = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(d, "text", n_merges=8)
    seg = bpe.apply_bpe(d, "text", "doc_id", merges)
    return seg.select(
        F.col("id").alias("doc_id"),
        F.size("subwords").alias("n_subwords"),
        "subwords",
    )
