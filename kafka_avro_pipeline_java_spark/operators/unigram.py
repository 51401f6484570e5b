"""Wordpiece / unigram-LM tokenization — the SentencePiece-flavored
counterpart to BPE (operators/bpe.py), rounding out tokenizer induction.

Two segmentation semantics over the SAME scale shape:

- wordpiece: greedy longest-match against a fixed piece inventory
  (Schuster & Nakajima 2012 / BERT's tokenizer, sans the ``##``
  continuation marker — documented simplification);
- unigram LM: Viterbi max-probability segmentation under per-piece
  log-probs (Kudo 2018), trained by hard (Viterbi) EM — expected counts
  are taken from the single best segmentation per word rather than the
  full lattice forward-backward; the standard simplification, stated
  honestly, and parity-tested against a pure-Python reference.

Scale shape (the same argument as bpe.apply_bpe): every per-character
loop runs on the DISTINCT-WORD table, never the token stream — the word
vocabulary is the unit of Python work, and it grows sublinearly in corpus
size. Segmentation is an Arrow-batched pandas UDF (the variable-advance
longest-match/DP loop has no higher-order-function expression), the piece
inventory is a CLOSURE constant — bounded by design at tokenizer vocab
size (32-100k pieces, a few MB pickled to executors), unlike the
unbounded word vocabulary which must never be broadcast. Mapping
segmentations back onto documents is the map join apply_bpe already
uses; training caches the word table so the corpus is scanned once
total, then runs per-round jobs over the vocab-sized table with a
≤vocab_size driver collect (the k-means / BPE-argmax bounded-driver
pattern).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts


def wordpiece_segment_words(words: DataFrame, pieces: list[str],
                            word_col: str = "word") -> DataFrame:
    """(word) → (word, pieces array<string>): greedy longest-match — at
    each position take the longest inventory piece that matches, else
    emit the single character as-is and advance one."""
    pset = frozenset(pieces)
    plens = sorted({len(p) for p in pieces}, reverse=True)

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        out = []
        for w in col:
            res: list[str] = []
            i, n = 0, len(w)
            while i < n:
                for length in plens:
                    if length <= n - i and w[i:i + length] in pset:
                        res.append(w[i:i + length])
                        i += length
                        break
                else:
                    res.append(w[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return words.select(
        F.col(word_col).alias("word"), seg(word_col).alias("pieces")
    )


def viterbi_segment_words(words: DataFrame, pieces: dict[str, float], *,
                          unk_logp: float = -20.0,
                          word_col: str = "word") -> DataFrame:
    """(word) → (word, pieces array<string>, logp double): the
    max-log-probability segmentation under a unigram piece LM. A single
    character absent from the inventory scores ``unk_logp``. Ties break
    toward the LONGER piece ending at each position (deterministic,
    engine-independent)."""
    maxlen = max((len(p) for p in pieces), default=1)
    inv = dict(pieces)

    @F.pandas_udf("pieces array<string>, logp double")
    def seg(col: pd.Series) -> pd.DataFrame:
        rows = []
        for w in col:
            n = len(w)
            # dp[i] = (best logp of w[:i], start index of last piece)
            NEG = float("-inf")
            dp = [NEG] * (n + 1)
            back = [0] * (n + 1)
            dp[0] = 0.0
            for i in range(1, n + 1):
                # longest candidate first so equal-logp ties keep the
                # longer final piece (smallest j wins by strict >)
                for j in range(max(0, i - maxlen), i):
                    piece = w[j:i]
                    lp = inv.get(piece)
                    if lp is None:
                        if i - j > 1:
                            continue
                        lp = unk_logp  # single-char fallback
                    cand = dp[j] + lp
                    if cand > dp[i]:
                        dp[i] = cand
                        back[i] = j
            res: list[str] = []
            i = n
            while i > 0:
                res.append(w[back[i]:i])
                i = back[i]
            res.reverse()
            rows.append((res, dp[n]))
        return pd.DataFrame(rows, columns=["pieces", "logp"])

    return words.select(
        F.col(word_col).alias("word"),
        seg(word_col).alias("s"),
    ).select("word", F.col("s.pieces").alias("pieces"),
             F.col("s.logp").alias("logp"))


def wordpiece_segment_docs(df: DataFrame, text_col: str, id_col: str,
                           pieces: list[str]) -> DataFrame:
    """Segment every document: (id, pieces array<string>) with word order
    preserved. The greedy loop runs once per DISTINCT word; the word →
    pieces map joins back onto the exploded token stream with no mandatory
    broadcast hint (vocabulary-sized side — AQE decides), exactly the
    apply_bpe shape."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    vocab = toks.select("word").distinct()
    segmented = wordpiece_segment_words(vocab, pieces)
    return (
        toks.join(segmented, "word")
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda x: x["pieces"],
                )
            ).alias("pieces")
        )
    )


def unigram_expected_counts(df: DataFrame, text_col: str,
                            pieces: dict[str, float], *,
                            unk_logp: float = -20.0,
                            word_counts_df: DataFrame | None = None,
                            ) -> DataFrame:
    """One hard-EM E-step: (piece, expected_count) — Viterbi-segment the
    DISTINCT words, then weight each word's piece usage by its corpus
    frequency. One corpus-sized word count (or a precomputed/cached
    ``word_counts_df`` — the trainer passes its cached table so EM
    rounds never rescan the corpus) + vocab-sized segmentation + one
    keyed agg; nothing corpus-sized touches Python."""
    wc = (word_counts_df if word_counts_df is not None
          else word_counts(df, text_col).localCheckpoint(eager=False))
    # the word-type-scale count table feeds the segmentation AND the
    # weight join; materialized once (r13) so the corpus tokenize+count
    # doesn't run per consumer once AQE broadcast-converts the join
    seg = viterbi_segment_words(wc.select("word"), pieces, unk_logp=unk_logp)
    return (
        wc.join(seg, "word")
        .select(F.explode("pieces").alias("piece"), "c")
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("expected_count"))
    )


def seed_substring_counts(wc: DataFrame, max_piece_len: int) -> DataFrame:
    """Frequency-weighted counts of every substring of length
    2..``max_piece_len`` over a (word, c) table — the unigram trainer's
    seed-candidate stage, exposed for direct testing. Candidates come
    from exploded (start, len) pairs built with array expressions only
    (one pass over the vocab-sized word table, no Python in the loop).

    ``sequence(1, 0)`` is the DESCENDING array [1, 0], so a word shorter
    than ``ln`` would emit two truncated whole-word "substrings" (pos 0
    aliases pos 1 in ``substring``) and double-count itself into the
    seed pool; the exact-length filter drops both spurious rows."""
    return (
        wc.select(
            "c",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(2), F.lit(max_piece_len)),
                        lambda ln: F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.length("word") - ln + 1, F.lit(0)
                                ),
                            ),
                            lambda st: F.struct(
                                st.alias("st"), ln.alias("ln")
                            ),
                        ),
                    )
                )
            ).alias("p"),
            F.col("word"),
        )
        .select(
            F.expr("substring(word, p.st, p.ln)").alias("sub"),
            F.col("p.ln").alias("ln"),
            "c",
        )
        .filter(F.length("sub") == F.col("ln"))
        .groupBy("sub")
        .agg(F.sum("c").alias("n"))
    )


def unigram_train(df: DataFrame, text_col: str, *, vocab_size: int = 512,
                  rounds: int = 3, seed_max_piece_len: int = 4,
                  seed_pool: int = 4096,
                  unk_logp: float = -20.0) -> dict[str, float]:
    """Train a unigram piece inventory by seeded hard EM.

    Seed: the ``seed_pool`` most frequent substrings of length 2..
    ``seed_max_piece_len`` from the word table, plus EVERY single
    character (segmentation totality). Each round: Viterbi expected
    counts (distributed), keep the ``vocab_size`` best pieces (all
    singles always kept), re-normalize to log-probs. Driver traffic per
    round is one ≤seed_pool-row collect — the bounded-argmax pattern of
    the BPE trainer and k-means updates."""
    wc = word_counts(df, text_col).cache()
    seed_rows = (
        seed_substring_counts(wc, seed_max_piece_len)
        .orderBy(F.desc("n"), "sub")
        .limit(seed_pool)
        .collect()
    )
    singles = {
        r["ch"]
        for r in wc.select(
            F.explode(F.split("word", "")).alias("ch")
        ).distinct().collect()
        if r["ch"]
    }
    counts: dict[str, float] = {r["sub"]: float(r["n"]) for r in seed_rows}
    for ch in singles:
        counts.setdefault(ch, 1.0)
    pieces = _normalize(counts)
    for _ in range(rounds):
        got = unigram_expected_counts(
            df, text_col, pieces, unk_logp=unk_logp, word_counts_df=wc
        ).collect()
        counts = {r["piece"]: float(r["expected_count"]) for r in got}
        # prune to vocab_size by count, singles always kept (totality)
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: max(vocab_size - len(singles), 0)]
        kept = dict(multi)
        for ch in singles:
            kept[ch] = counts.get(ch, 1.0)
        pieces = _normalize(kept)
    wc.unpersist()
    return pieces


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(max(c, 1.0) for c in counts.values())
    return {p: math.log(max(c, 1.0) / total) for p, c in counts.items()}
