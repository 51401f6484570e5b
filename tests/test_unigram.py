"""Wordpiece / unigram-LM tokenization (operators/unigram.py): pure-Python
parity for both segmenters, Viterbi-beats-greedy, EM counts, trainer
likelihood improvement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_avro_pipeline_java_spark.operators.unigram import (
    unigram_expected_counts,
    unigram_train,
    viterbi_segment_words,
    wordpiece_segment_docs,
    wordpiece_segment_words,
)

# ------------------------------------------------- pure-Python references


def _ref_wordpiece(word: str, pieces: list[str]) -> list[str]:
    pset = set(pieces)
    plens = sorted({len(p) for p in pieces}, reverse=True)
    out, i = [], 0
    while i < len(word):
        for ln in plens:
            if word[i:i + ln] in pset:
                out.append(word[i:i + ln])
                i += ln
                break
        else:
            out.append(word[i])
            i += 1
    return out


def _ref_viterbi(word: str, pieces: dict[str, float],
                 unk: float) -> tuple[list[str], float]:
    n = len(word)
    maxlen = max(len(p) for p in pieces)
    dp = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - maxlen), i):
            lp = pieces.get(word[j:i])
            if lp is None:
                if i - j > 1:
                    continue
                lp = unk
            if dp[j] + lp > dp[i]:
                dp[i] = dp[j] + lp
                back[i] = j
    out, i = [], n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return out[::-1], dp[n]


PIECES = ["the", "ing", "er", "an", "re", "on", "at", "en"]
LM = {"ab": -1.0, "abc": -5.0, "c": -1.5, "bc": -1.2, "a": -2.0, "b": -2.5}


def test_wordpiece_matches_reference_on_corpus_words(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    got = {r.word: list(r.pieces)
           for r in wordpiece_segment_words(words, PIECES).collect()}
    assert len(got) > 20
    for w, ps in got.items():
        assert ps == _ref_wordpiece(w, PIECES), w
        assert "".join(ps) == w  # lossless


def test_wordpiece_prefers_longest_match(spark):
    words = spark.createDataFrame([("therein",)], "word string")
    [row] = wordpiece_segment_words(words, PIECES).collect()
    # 'the' (len 3) beats 'th'+'erein' paths; then 're', 'in' absent → chars
    assert list(row.pieces) == ["the", "re", "i", "n"]


def test_viterbi_beats_greedy_longest_match(spark):
    # greedy takes 'abc' (-5); Viterbi picks 'ab'+'c' (-2.5)
    words = spark.createDataFrame([("abc",)], "word string")
    [row] = viterbi_segment_words(words, LM, unk_logp=-6.0).collect()
    assert list(row.pieces) == ["ab", "c"]
    assert abs(row.logp - (-2.5)) < 1e-9


def test_viterbi_matches_reference_on_corpus_words(spark, sf_dir):
    lm = {"the": -2.0, "ing": -2.5, "er": -3.0, "an": -3.2, "e": -4.5,
          "t": -4.6, "a": -4.7}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    got = viterbi_segment_words(words, lm, unk_logp=-6.0).collect()
    for r in got:
        ref_ps, ref_lp = _ref_viterbi(r.word, lm, -6.0)
        assert list(r.pieces) == ref_ps, r.word
        assert abs(r.logp - ref_lp) < 1e-9
        assert "".join(r.pieces) == r.word


def test_viterbi_unknown_chars_take_unk_logp(spark):
    words = spark.createDataFrame([("xyz",)], "word string")
    [row] = viterbi_segment_words(words, LM, unk_logp=-7.0).collect()
    assert list(row.pieces) == ["x", "y", "z"]
    assert abs(row.logp - (-21.0)) < 1e-9


def test_wordpiece_docs_preserve_word_order(spark):
    df = spark.createDataFrame(
        [(1, "the the ingest"), (2, "reren")], "doc_id long, text string"
    )
    got = {r.id: list(r.pieces)
           for r in wordpiece_segment_docs(df, "text", "doc_id", PIECES).collect()}
    assert got[1] == ["the", "the", "ing", "e", "s", "t"]
    assert got[2] == ["re", "re", "n"]


def test_unigram_expected_counts_weighted_by_frequency(spark):
    # 'abc' twice + 'ab' once: Viterbi('abc') = ab+c, Viterbi('ab') = ab
    df = spark.createDataFrame(
        [(1, "abc ab"), (2, "abc")], "doc_id long, text string"
    )
    got = {r.piece: r.expected_count
           for r in unigram_expected_counts(df, "text", LM, unk_logp=-6.0).collect()}
    assert got == {"ab": 3, "c": 2}


def test_unigram_train_improves_corpus_likelihood(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)

    def corpus_logp(pieces: dict[str, float]) -> float:
        from kafka_avro_pipeline_java_spark.operators.bpe import word_counts

        wc = word_counts(d, "text")
        seg = viterbi_segment_words(wc.select("word"), pieces, unk_logp=-20.0)
        [row] = (
            wc.join(seg, "word")
            .agg(F.sum(F.col("c") * F.col("logp")).alias("ll"))
            .collect()
        )
        return row.ll

    trained = unigram_train(d, "text", vocab_size=96, rounds=2, seed_pool=256)
    assert len(trained) <= 96 + 64  # vocab_size plus single-char floor
    assert all(lp < 0 for lp in trained.values())
    # singles present → segmentation total
    assert all(len(p) >= 1 for p in trained)
    # a trained inventory should explain the corpus at least as well as
    # the frequency-seeded one it started from
    seed_only = {p: lp for p, lp in trained.items() if len(p) == 1}
    assert corpus_logp(trained) >= corpus_logp(seed_only)


def test_seed_substring_counts_exact_no_short_word_doubling(spark):
    # 'ab' is shorter than max_piece_len=4: before the exact-length
    # filter, sequence(1, 0) = [1, 0] made it contribute two spurious
    # whole-word rows per oversized length tier (~2x seed inflation)
    from kafka_avro_pipeline_java_spark.operators.unigram import (
        seed_substring_counts,
    )

    wc = spark.createDataFrame(
        [("ab", 5), ("abcd", 2)], ["word", "c"]
    )
    got = {
        r["sub"]: r["n"] for r in seed_substring_counts(wc, 4).collect()
    }
    expect = {}
    for word, c in [("ab", 5), ("abcd", 2)]:
        for ln in (2, 3, 4):
            for st in range(len(word) - ln + 1):
                sub = word[st:st + ln]
                expect[sub] = expect.get(sub, 0) + c
    assert got == expect
    assert got["ab"] == 7  # 5 (the word itself) + 2 (from 'abcd'), not 17
