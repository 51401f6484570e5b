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


# The literal merge table for the APPLY read path — the same train/apply
# split as the literal-centroid IVF and PQ/ADC read-path rows: training
# (driver-side sequential argmax) stays pinned by text_bpe_pair_stats'
# oracle + the pure-Python parity tests, while application of a FIXED table
# is deterministic string algebra both engines can run. Merges apply in
# order; later rules consume symbols fused by earlier ones.
_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e</w>"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d</w>"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
]


def _bpe_segment_oracle() -> str:
    # Wrapped-symbol representation: every symbol is chr(1)||sym||chr(2),
    # so SQL replace() of chr(1)a chr(2)chr(1)b chr(2) -> chr(1)ab chr(2)
    # IS the greedy left-to-right non-overlapping merge pass: symbol
    # boundaries are explicit (no cross-symbol matches — chr(1)/chr(2)
    # never occur inside symbol names), and a replacement can never create
    # a new match of the SAME pattern (the fused name differs), so scan
    # order is immaterial. Exactly mirrors operators/bpe.py::_merge_adjacent.
    wrapped = (
        "array_to_string(list_transform(range(1, len(word) + 1),"
        " i -> chr(1) || substr(word, i, 1)"
        " || CASE WHEN i = len(word) THEN '</w>' ELSE '' END || chr(2)), '')"
    )
    merged = wrapped
    for a, b in _BPE_MERGES:
        pat = f"chr(1) || '{a}' || chr(2) || chr(1) || '{b}' || chr(2)"
        rep = f"chr(1) || '{a}{b}' || chr(2)"
        merged = f"replace({merged}, {pat}, {rep})"
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), words AS (
      SELECT doc_id, i.i AS pos, ws[i.i] AS word
      FROM toks, UNNEST(range(1, len(ws) + 1)) AS i(i)
    ), segged AS (
      SELECT doc_id, pos,
             trim(replace({merged}, chr(2) || chr(1), ' '),
                  chr(1) || chr(2)) AS sub
      FROM words
    ), docs AS (
      SELECT doc_id, string_agg(sub, ' ' ORDER BY pos) AS subwords
      FROM segged GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(len(string_split(subwords, ' ')) AS INT) AS n_subwords,
           subwords
    FROM docs
    """


@query("text_bpe_segment", oracle=_bpe_segment_oracle())
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every document with the LITERAL 8-rule merge table
    ``_BPE_MERGES``: (doc_id, n_subwords, subwords as a space-joined
    string). This is the tokenizer READ PATH — greedy left-to-right
    non-overlapping merge application (operators/bpe.py::apply_bpe:
    re-tokenize the DISTINCT words only, join the word→subwords map
    back over the token stream — AQE broadcasts the vocab side when small) — under a full
    value oracle (the wrapped-symbol iterated-replace construction above
    reproduces the greedy pass in DuckDB exactly). The TRAINER
    (sequential driver-side argmax, like k-means updates) stays covered
    by text_bpe_pair_stats' oracle and the pure-Python parity tests in
    tests/test_bpe.py."""
    d = load_table(spark, sf_dir, "documents")
    seg = bpe.apply_bpe(d, "text", "doc_id", _BPE_MERGES)
    return seg.select(
        F.col("id").alias("doc_id"),
        F.size("subwords").cast("int").alias("n_subwords"),
        F.array_join("subwords", " ").alias("subwords"),
    )


from ..operators import unigram  # noqa: E402


# Fixed piece inventory for the wordpiece READ path — same train/apply
# split as _BPE_MERGES: application of a LITERAL inventory is
# deterministic string algebra both engines can run; the trainer stays
# parity-tested (tests/test_unigram.py).
_WP_PIECES: list[str] = [
    "the", "ing", "er", "an", "re", "on", "at", "en", "or", "es", "ti", "te",
]

# Literal unigram-LM piece log-probs for the Viterbi read path. unk=-6.0
# sits below every listed piece, so multi-char pieces win where they fit.
_UNI_PIECES: dict[str, float] = {
    "the": -2.0, "ing": -2.5, "er": -3.0, "an": -3.2, "in": -3.1,
    "re": -3.4, "on": -3.5, "at": -3.6, "en": -3.7, "es": -3.8,
    "or": -3.85, "te": -3.9, "ti": -4.0, "e": -4.5, "t": -4.6, "a": -4.7,
    "o": -4.8, "s": -4.9, "n": -5.0, "r": -5.1, "i": -5.2,
}
_UNI_UNK = -6.0


def _wordpiece_oracle() -> str:
    # Greedy longest-match as a recursive CTE: each step consumes one
    # piece (a literal CASE ordered longest-first mirrors the operator's
    # longest-match loop exactly), advancing pos by its length; a word of
    # n chars terminates in ≤ n steps. The DISTINCT-word recursion then
    # joins back onto the positioned token stream — the same
    # vocab-not-stream shape as the Spark plan.
    pieces_desc = sorted(_WP_PIECES, key=lambda p: (-len(p), p))
    case = "CASE " + " ".join(
        f"WHEN substr(word, pos2, {len(p)}) = '{p}' THEN '{p}'"
        for p in pieces_desc
    ) + " ELSE substr(word, pos2, 1) END"
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), words AS (
      SELECT doc_id, i.i AS pos, ws[i.i] AS word
      FROM toks, UNNEST(range(1, len(ws) + 1)) AS i(i)
    ), vocab AS (
      SELECT DISTINCT word FROM words
    ), seg(word, pos2, pieces) AS (
      SELECT word, 1, CAST('' AS VARCHAR) FROM vocab
      UNION ALL
      SELECT word, pos2 + len(piece),
             CASE WHEN pieces = '' THEN piece
                  ELSE pieces || ' ' || piece END
      FROM (SELECT word, pos2, pieces, {case} AS piece
            FROM seg WHERE pos2 <= len(word))
    ), done AS (
      SELECT word, pieces FROM seg WHERE pos2 = len(word) + 1
    ), docs AS (
      SELECT w.doc_id, string_agg(d.pieces, ' ' ORDER BY w.pos) AS pieces
      FROM words w JOIN done d USING (word)
      GROUP BY w.doc_id
    )
    SELECT doc_id,
           CAST(len(string_split(pieces, ' ')) AS INT) AS n_pieces,
           pieces
    FROM docs
    """


@query("text_wordpiece_segment", oracle=_wordpiece_oracle())
def text_wordpiece_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every document by greedy longest-match against the LITERAL
    12-piece inventory ``_WP_PIECES`` (wordpiece semantics, no ``##``
    marker): (doc_id, n_pieces, pieces space-joined). The match loop runs
    once per DISTINCT word as an Arrow-batched pandas UDF
    (operators/unigram.py::wordpiece_segment_docs); the word→pieces map
    joins back un-hinted (vocabulary-sized side, AQE decides)."""
    d = load_table(spark, sf_dir, "documents")
    seg = unigram.wordpiece_segment_docs(d, "text", "doc_id", _WP_PIECES)
    return seg.select(
        F.col("id").alias("doc_id"),
        F.size("pieces").cast("int").alias("n_pieces"),
        F.array_join("pieces", " ").alias("pieces"),
    )


def _uni_lp_case(length: int) -> str:
    """CASE expression scoring the candidate piece substr(word, pos+1, L)
    against the length-``L`` slice of the literal inventory; single chars
    fall back to the UNK score, longer pieces to NULL (= not a piece)."""
    items = [(p, lp) for p, lp in _UNI_PIECES.items() if len(p) == length]
    body = " ".join(
        f"WHEN '{p}' THEN CAST({lp!r} AS DOUBLE)" for p, lp in items
    )
    case = f"CASE substr(w.word, w.pos + 1, {length}) {body} ELSE NULL END"
    if length == 1:
        return f"COALESCE({case}, CAST({_UNI_UNK!r} AS DOUBLE))"
    return case


def _viterbi_oracle_cte() -> str:
    """Viterbi as enumerate-then-argmax (WITH RECURSIVE): every
    segmentation of every DISTINCT word (words are short, so the walk is
    vocab×2^(len-1) bounded), then one window argmax per word on
    (score DESC, reversed-length-sequence DESC). The tie key is the DP's
    backtrace rule made global: a max-score segmentation has an optimal
    prefix at every boundary, so "longest final piece, then longest
    second-to-last, ..." — i.e. the reversed per-piece length string,
    compared descending — selects exactly the segmentation the strict->
    longest-candidate-first DP in viterbi_segment_words reconstructs.
    Scores add left-to-right in both engines, so the doubles are
    bit-identical."""
    maxlen = max(len(p) for p in _UNI_PIECES)
    lens = list(range(1, maxlen + 1))
    lp_branches = " ".join(
        f"WHEN l.l = {ln} THEN {_uni_lp_case(ln)}" for ln in lens if ln > 1
    )
    lp_expr = f"CASE {lp_branches} ELSE {_uni_lp_case(1)} END"
    return f"""
    vocab AS (
      SELECT DISTINCT t.tok AS word
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ), walk(word, pos, score, lens, pieces) AS (
      SELECT word, 0, CAST(0.0 AS DOUBLE), '', CAST([] AS VARCHAR[])
      FROM vocab
      UNION ALL
      SELECT w.word, w.pos + l.l, w.score + ({lp_expr}),
             w.lens || CAST(l.l AS VARCHAR),
             list_append(w.pieces, substr(w.word, w.pos + 1, l.l))
      FROM walk w, UNNEST([{", ".join(str(x) for x in lens)}]) AS l(l)
      WHERE w.pos + l.l <= len(w.word) AND ({lp_expr}) IS NOT NULL
    ), best AS (
      SELECT word, pieces, score,
             ROW_NUMBER() OVER (PARTITION BY word
                                ORDER BY score DESC, reverse(lens) DESC)
               AS rn
      FROM walk WHERE pos = len(word)
    )"""


@query(
    "text_unigram_viterbi",
    oracle=f"""
    WITH RECURSIVE {_viterbi_oracle_cte()}
    SELECT word, array_to_string(pieces, ' ') AS pieces,
           ROUND(score, 4) AS logp
    FROM best WHERE rn = 1
    """,
)
def text_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi max-probability segmentation of the corpus's DISTINCT words
    under the literal unigram piece LM ``_UNI_PIECES`` (Kudo 2018 read
    path): (word, pieces, logp). Oracle-backed since round 7: the DP has
    no direct SQL form, but with a LITERAL inventory the oracle can
    enumerate all segmentations per distinct word (recursive CTE, words
    are short) and take the same (score, longest-final-piece) argmax the
    DP's backtrace produces — see _viterbi_oracle_cte for the tie-rule
    equivalence argument. Algorithm additionally pinned by pure-Python
    parity tests (tests/test_unigram.py)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    seg = unigram.viterbi_segment_words(words, _UNI_PIECES, unk_logp=_UNI_UNK)
    return seg.select(
        "word",
        F.array_join("pieces", " ").alias("pieces"),
        F.round("logp", 4).alias("logp"),
    )


@query(
    "text_unigram_em_counts",
    oracle=f"""
    WITH RECURSIVE {_viterbi_oracle_cte()},
    wc AS (
      SELECT t.tok AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
      GROUP BY 1
    )
    SELECT p.piece, CAST(SUM(wc.c) AS BIGINT) AS expected_count
    FROM best b
    JOIN wc USING (word), UNNEST(b.pieces) AS p(piece)
    WHERE b.rn = 1
    GROUP BY 1
    """,
)
def text_unigram_em_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hard-EM E-step over the corpus: corpus-frequency-weighted
    Viterbi piece usage under ``_UNI_PIECES`` → (piece, expected_count).
    The M-step (re-normalize, prune, iterate) is the bounded driver loop
    in operators/unigram.py::unigram_train, parity- and
    likelihood-improvement-tested. Oracle-backed since round 7: the
    Viterbi enumerate-then-argmax CTE (text_unigram_viterbi) joined to
    corpus word counts reproduces the E-step's integer counts exactly."""
    d = load_table(spark, sf_dir, "documents")
    return unigram.unigram_expected_counts(
        d, "text", _UNI_PIECES, unk_logp=_UNI_UNK
    )
