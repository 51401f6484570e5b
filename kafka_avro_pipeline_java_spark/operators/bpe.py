"""Byte-pair-encoding vocabulary induction on the corpus word table.

The missing piece between "token counting" (functions/text.py uses
whitespace + a BPE-ish regex) and a real trained subword tokenizer: learn
the merge table itself from corpus statistics. Classic Sennrich-style BPE
over the WORD FREQUENCY table — which is the whole scalability story:

- The corpus (100 TB) is touched ONCE, by a word-count aggregation; every
  merge iteration then runs against the vocab-sized (word, count) table —
  millions of rows, not corpus rows.
- Each iteration is one pair-count aggregation (explode adjacent symbol
  pairs weighted by word count → sum) plus a 1-row TakeOrdered argmax
  collected to the driver (the merge decision is inherently sequential —
  same division of labor as k-means centroid updates in clustering.py).
- Applying a learned merge table to a corpus re-tokenizes the DISTINCT
  words only, then joins the (word → subwords) map back onto
  the token stream — the corpus never re-shuffles per merge.

Merging is the standard greedy left-to-right non-overlapping pass,
expressed as a single `aggregate` fold per word (JVM-side lambdas, no
Python in the loop); tests pin parity against an independent pure-Python
reference implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_ACC_T = "struct<out:array<string>,prev:string>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, c) over the lowercased whitespace token stream — the one
    corpus-sized job in BPE training."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def _merge_adjacent(seq_col, a: str, b: str):
    """Greedy left-to-right non-overlapping replacement of the adjacent
    symbol pair (a, b) with the fused symbol a+b, as one fold."""
    fused = a + b

    def step(acc, s):
        take = acc["prev"].isNotNull() & (acc["prev"] == a) & (s == F.lit(b))
        return F.when(
            take,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(fused))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("prev"),
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    ).cast(_ACC_T)
    return F.aggregate(
        seq_col,
        init,
        step,
        lambda acc: F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"]),
    )


def train_bpe(
    df: DataFrame, text_col: str, *, n_merges: int = 10, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merge rules. Words start as character
    sequences with an end-of-word marker '</w>' on the final character
    (Sennrich convention: word-final units stay distinct). Ties on pair
    count break lexicographically, so training is deterministic."""
    wc = word_counts(df, text_col)
    seqs = wc.select(
        F.col("c"),
        F.concat(
            F.slice(F.split("word", ""), 1, F.length("word") - 1),
            F.array(F.concat(F.element_at(F.split("word", ""), -1), F.lit("</w>"))),
        ).alias("syms"),
    ).where(F.length("word") >= 1)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            seqs.select(
                "c",
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("a"),
                                F.element_at("syms", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        seqs = seqs.select("c", _merge_adjacent(F.col("syms"), a, b).alias("syms"))
    return merges


def apply_bpe(df: DataFrame, text_col: str, id_col: str, merges) -> DataFrame:
    """Segment each document with a learned merge table: (id, subwords).
    Re-tokenizes the DISTINCT words only, then joins the (word → subwords)
    map back onto the exploded token stream, so the expensive merge fold
    runs once per distinct word, never once per occurrence. The map side
    carries NO mandatory broadcast hint: it is VOCABULARY-sized — 10⁸+
    rows on a web-scale corpus, the same driver-OOM class as a forced df
    table broadcast — and AQE broadcasts it on its own whenever it is
    actually small (every test corpus here)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    vocab = toks.select("word").distinct()
    seq = F.concat(
        F.slice(F.split("word", ""), 1, F.length("word") - 1),
        F.array(F.concat(F.element_at(F.split("word", ""), -1), F.lit("</w>"))),
    )
    segmented = vocab.select("word", seq.alias("syms"))
    for a, b in merges:
        segmented = segmented.select(
            "word", _merge_adjacent(F.col("syms"), a, b).alias("syms")
        )
    joined = toks.join(segmented, "word")
    return (
        joined.groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda x: x["syms"],
                )
            ).alias("subwords")
        )
    )
