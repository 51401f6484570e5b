"""Corpus quality operators for pre-training pipelines.

Two standard document-quality passes used by large-scale LLM data
pipelines, both as pure built-in-expression plans (JVM codegen, no Python):

- ``gopher_rules``: the heuristic rule battery from the Gopher paper
  (Rae et al. 2021, "Scaling Language Models", appendix A1.1) — per-doc
  metrics plus pass/fail flags. One scan, one projection, zero shuffles:
  quality gating at 100 TB is embarrassingly parallel.
- ``unigram_logprob``: mean per-token log-probability under a unigram LM
  fit on the corpus itself — the cheap "perplexity-ish" quality signal
  (docs of rare/garbled tokens score low). Two word-count-shaped
  aggregations; the vocabulary is a corpus-level aggregate that at 100 TB
  is millions of rows, so the score join stays a shuffle equi-join on the
  token (NOT a broadcast — vocabularies outgrow broadcast thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# Gopher A1.1 stop-set: a doc must contain >= 2 distinct words of this set.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Gopher A1.1 thresholds (public paper values).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MIN_ALPHA_FRAC = 0.8
MIN_STOP_HITS = 2


def _occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace-and-measure — identical
    left-to-right semantics in Spark and the DuckDB oracle."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def gopher_metrics(text_col: Column | str) -> dict[str, Column]:
    """The raw per-document Gopher metrics as named column expressions."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = T.tokens(c)
    lines = F.split(c, "\n")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    return {
        "n_words": n_words,
        "mean_word_len": F.round(T.avg_token_len(c), 4),
        "symbol_ratio": F.round(
            (_occurrences(c, "#") + _occurrences(c, "...")) / n_words, 4
        ),
        "bullet_frac": F.round(
            F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([*-]|•)")))
            / n_lines,
            4,
        ),
        "ellipsis_frac": F.round(
            F.size(F.filter(lines, lambda l: F.trim(l).endswith("..."))) / n_lines, 4
        ),
        "alpha_frac": F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / n_words, 4
        ),
        "stop_hits": F.size(
            F.array_intersect(
                F.array_distinct(T.tokens(F.lower(c))),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        ),
    }


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Gopher rule metrics + the conjunction gate.

    Output: (id, each metric, passes_gopher 0/1). Plan shape is a single
    scan→project — every rule is a whole-stage-codegen expression over the
    document text; nothing shuffles, nothing leaves the JVM."""
    m = gopher_metrics(text_col)
    passes = (
        m["n_words"].between(MIN_WORDS, MAX_WORDS)
        & m["mean_word_len"].between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (m["symbol_ratio"] <= MAX_SYMBOL_RATIO)
        & (m["bullet_frac"] <= MAX_BULLET_FRAC)
        & (m["ellipsis_frac"] <= MAX_ELLIPSIS_FRAC)
        & (m["alpha_frac"] >= MIN_ALPHA_FRAC)
        & (m["stop_hits"] >= MIN_STOP_HITS)
    )
    return df.select(
        F.col(id_col),
        *[expr.alias(name) for name, expr in m.items()],
        passes.cast("int").alias("passes_gopher"),
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Mean log P(token) per document under the corpus unigram distribution.

    Pass 1 (vocabulary): explode lowercased whitespace tokens, count per
    token — word-count shape, partial aggregation map-side so the shuffle
    carries (token, partial_count), not raw tokens. Pass 2 (scoring): the
    token stream joins the vocabulary on the token (shuffle equi-join; at
    100 TB the vocab is too big to broadcast and both sides hash-partition
    by token), then one groupBy(id) mean. Every token always hits the
    vocabulary (it was counted from the same corpus) so the join is inner
    with no loss. Total: one aggregate shuffle + one join shuffle + one
    per-doc agg — all keyed, no global sort."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("n_total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select("id", F.log(F.col("cnt") / F.col("n_total")).alias("lp"))
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
    )


def importance_sample(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Quality-weighted corpus sampling: keep each document with
    probability equal to its quality score, deterministically.

    The accept/reject draw is the portable 60-bit md5 hash of the id
    mapped to [0, 1) — reproducible across runs AND engines (the DuckDB
    oracle derives the identical draw), so the sampled corpus is stable:
    re-running the pipeline, or running it on a different cluster, selects
    the same documents. Pure projection + filter, zero shuffles — the
    up-weighting of high-quality data costs one scan."""
    from ..functions.hashing import portable_hash64

    c = F.col(id_col)
    weight = T.quality_score(text_col)
    draw = F.pmod(portable_hash64(c.cast("string")), F.lit(10000)) / F.lit(10000.0)
    return (
        df.select(c, weight.alias("weight"), draw.alias("draw"))
        .filter(F.col("draw") < F.col("weight"))
        .select(id_col, "weight")
    )
