"""Substring-level (span) duplication detection.

Document-level dedup misses boilerplate REPEATED INSIDE otherwise-distinct
documents (licenses, navigation chrome, templated intros). The standard fix
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") removes repeated token SPANS. A distributed suffix array is
impractical on Spark; the equivalent-fidelity approximation for a fixed
span width w is exact: hash every w-token window, find hashes occurring in
more than one document, and flag/measure the covered positions.

Plan shape: tokenize into a materialized array behind a repartition
exchange (higher-order-function lambdas get no subexpression elimination —
an inline split() would re-tokenize per window), emit one (id, pos, hash)
row per window via a single posexplode, then ONE window count over the
span hash and ONE per-doc aggregate. Cost is linear in corpus token count;
the only shuffles are keyed (span hash, then doc id). At 100 TB the span
hash is a near-uniform 128-bit-derived key — no skew guard needed except
for degenerate all-identical corpora, where the df-cap idea from
operators/dedup.py applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def span_table(df: DataFrame, text_col: str, id_col: str, w: int = 5) -> DataFrame:
    """(id, pos, span_hash) — one row per w-token window, 1-based pos.

    The hash is the md5-portable 16-hex prefix of the space-joined window,
    so a DuckDB oracle derives identical hashes. Docs shorter than w tokens
    produce no rows (Spark's sequence(1, n) would count DOWN for n < 1, so
    the window list is guarded to an empty array)."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks")
    )
    toks = toks.repartition(toks.sparkSession.sparkContext.defaultParallelism, "id")
    n_spans = F.size("toks") - F.lit(w - 1)
    span_hashes = F.when(n_spans >= 1, F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice("toks", i, w))), 1, 16
        ),
    )).otherwise(F.array().cast("array<string>"))
    return toks.select(
        "id", F.posexplode(span_hashes).alias("pos0", "span_hash")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "span_hash")


def span_dup_stats(df: DataFrame, text_col: str, id_col: str, w: int = 5) -> DataFrame:
    """Per-document span-duplication profile.

    Output: (id, n_spans, n_dup_spans, dup_frac) where a span is "dup" when
    its hash occurs in >= 2 DISTINCT documents — the trim/mask decision
    input for substring-level dedup (a pipeline drops or masks docs/spans
    above a dup_frac threshold).

    A window count over span_hash (one hash shuffle) marks each position;
    the per-doc aggregate is a second keyed shuffle. Distinct-doc counting
    per hash avoids flagging a doc's own internal repetition as cross-doc
    boilerplate."""
    spans = span_table(df, text_col, id_col, w)
    # approx: COUNT(DISTINCT id) over a window is unsupported; use the
    # min/max trick — a hash spans >=2 docs iff min(id) != max(id).
    byhash = Window.partitionBy("span_hash")
    flagged = spans.select(
        "id",
        (F.min("id").over(byhash) != F.max("id").over(byhash)).cast("int").alias("is_dup"),
    )
    return flagged.groupBy("id").agg(
        F.count("*").cast("int").alias("n_spans"),
        F.sum("is_dup").cast("int").alias("n_dup_spans"),
        F.round(F.sum("is_dup") / F.count("*"), 4).alias("dup_frac"),
    )


def ngram_decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bench_pred,
    w: int = 5,
) -> DataFrame:
    """N-gram-overlap benchmark decontamination (the GPT-3-style variant of
    the exact-fingerprint check in plans/text.py::pipeline_decontaminate):
    a training doc is contaminated when it shares ANY w-token span with a
    held-out evaluation doc, even if the rest of the document differs.

    ``bench_pred`` is a boolean Column marking evaluation rows. Returns the
    CONTAMINATED training docs: (id, n_overlap_spans).

    Scale shape: eval sets are small by nature, so their span-hash set
    broadcasts; the corpus-side span stream is a projection (tokenize →
    posexplode) that meets the broadcast hash set with no shuffle, then one
    keyed per-doc count. At 100 TB the corpus never shuffles for the
    overlap check itself."""
    bench_hashes = (
        span_table(df.filter(bench_pred), text_col, id_col, w)
        .select("span_hash")
        .distinct()
    )
    corpus_spans = span_table(df.filter(~bench_pred), text_col, id_col, w)
    return (
        corpus_spans.join(F.broadcast(bench_hashes), "span_hash")
        .groupBy("id")
        .agg(F.count("*").cast("int").alias("n_overlap_spans"))
    )


def scrub_spans(df: DataFrame, text_col: str, id_col: str, w: int = 5) -> DataFrame:
    """The REMOVE half of substring-level dedup: rebuild each document with
    every token position covered by a cross-doc duplicated span deleted
    (Lee et al. 2022 drop the repeated substring, keeping the remainder).

    Output: (id, scrubbed, n_tokens, n_removed) where ``scrubbed`` is the
    surviving tokens joined by single spaces in original order — i.e. the
    whitespace/case-normalized form, which is what a dedup stage feeds
    downstream anyway.

    Shape: the span table + one window to flag cross-doc hashes (shuffle on
    the hash), an explode of flagged spans into covered positions, an
    anti-join of the token-position stream against the covered set (both
    keyed by doc), and one per-doc rebuild aggregate (collect+sort of the
    SURVIVING tokens only — bounded by document length, the same per-doc
    bound tokenization already implies)."""
    byhash = Window.partitionBy("span_hash")
    sp = span_table(df, text_col, id_col, w).select(
        "id", "pos",
        (F.min("id").over(byhash) != F.max("id").over(byhash)).alias("is_dup"),
    )
    covered = (
        sp.filter("is_dup")
        .select("id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (w - 1))).alias("tok_pos"))
        .distinct()
    )
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks")
    )
    toks = toks.repartition(toks.sparkSession.sparkContext.defaultParallelism, "id")
    positions = toks.select(
        "id", F.posexplode("toks").alias("p0", "tok")
    ).select("id", (F.col("p0") + 1).alias("tok_pos"), "tok")
    kept = positions.join(covered, ["id", "tok_pos"], "left_anti")
    n_toks = toks.select("id", F.size("toks").alias("n_tokens"))
    return (
        kept.groupBy("id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok_pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("scrubbed"),
            F.count("*").cast("int").alias("n_kept"),
        )
        .join(n_toks, "id")
        .select(
            "id", "scrubbed", "n_tokens",
            (F.col("n_tokens") - F.col("n_kept")).cast("int").alias("n_removed"),
        )
    )
