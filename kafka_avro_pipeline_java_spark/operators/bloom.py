"""Bloom-filter membership prefilter for decontamination-class anti-joins.

The scale problem: n-gram decontamination checks every corpus span against
an evaluation span set. When that set is small, a broadcast hash set of the
raw hashes suffices (operators/spans.py::ngram_decontaminate). But a large
benchmark suite can hold ~10⁸ distinct spans — gigabytes as 16-byte keys,
past broadcast limits — while the same membership at ~10 bits/key is a
~125 MB bitmask that still ships to every executor. The Bloom filter is
that bitmask: k hashed bit probes per corpus span, pure codegen arithmetic
(no join, no shuffle), false-positive rate (1 − e^{−kn/m})^k, and — the
property that keeps results EXACT — zero false negatives. Bloom-negative
spans are definitively clean; only bloom-positive survivors (true hits +
~0.5% FPs) proceed to the exact verify join, which at full scale is a
shuffle join whose input is the survivor sliver, not the corpus.

Build side: positions are computed distributed, and the distinct position
list (≤ k·|eval set| ints) is collected to build the literal mask — the
same bounded-driver-collect discipline as the broadcast eval set it
replaces (a corpus-sized build would instead aggregate `bit_or` words into
a (word_idx → bits) table and broadcast-join on word_idx).

Probes use md5-portable hashing (functions/hashing.py::portable_hash64)
so the filter is deterministic across engines, but the ORACLE never needs
to model it: the exact verify makes the final semantics plain
overlap/anti-join, which is what the DuckDB side states directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    # salt the key per probe; pmod keeps positions non-negative
    return [
        F.pmod(portable_hash64(F.concat(col, F.lit(f"#{i}"))), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(df: DataFrame, col: str, *, m_bits: int = 1 << 14, k: int = 3) -> list[int]:
    """Bitmask (list of ``m_bits // 64`` signed 64-bit words) covering every
    value of ``df[col]``. Distributed hashing; one bounded collect of the
    distinct bit positions."""
    pos = (
        df.select(F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        words[r.p // 64] |= 1 << (r.p % 64)
    # to signed 64-bit (Spark BIGINT literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_test(col: Column, mask: list[int], *, m_bits: int | None = None, k: int = 3) -> Column:
    """True iff ``col`` MIGHT be in the set the mask was built from (never
    false for a true member). Pure codegen: k getbit probes into the
    literal word array — no join, no shuffle, no Python."""
    m = m_bits if m_bits is not None else len(mask) * 64
    mask_lit = F.array(*[F.lit(w).cast("bigint") for w in mask])
    hit = F.lit(True)
    for p in _positions(col, m, k):
        word = F.element_at(mask_lit, (p / 64).cast("int") + 1)
        hit = hit & (F.call_function("getbit", word, p % 64) == 1)
    return hit


def bloom_words_df(df: DataFrame, col: str, *, m_bits: int = 1 << 22, k: int = 3) -> DataFrame:
    """Distributed Bloom build: the bitmask as a (widx, bits) DataFrame of
    NON-ZERO 64-bit words (aggregated with bit_or, never collected). The
    scale form of ``bloom_build`` — a 2²²-bit mask is 65k words, which as
    a LITERAL array defeats codegen (measured 126 s for the probe pass at
    200k docs vs 4 s with the join form below); as a broadcast table it
    stays a hash-join build side of ≤ m/64 rows."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("p")
    ).distinct()
    return (
        pos.select(
            (F.col("p") / 64).cast("long").alias("widx"),
            F.pmod(F.col("p"), F.lit(64)).cast("int").alias("bit"),
        )
        .groupBy("widx")
        .agg(
            F.bit_or(F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit")))
            .alias("bits")
        )
    )


def bloom_filter_members(
    probe: DataFrame,
    col: str,
    words: DataFrame,
    *,
    m_bits: int = 1 << 22,
    k: int = 3,
) -> DataFrame:
    """Rows of ``probe`` that MIGHT be members (zero false negatives): k
    broadcast hash joins against the non-zero mask words, one per probe
    hash — the corpus side streams, nothing shuffles, and a missing word
    means a clear bit (left join + coalesce)."""
    out = probe
    bw = F.broadcast(words)
    for i in range(k):
        p = F.pmod(portable_hash64(F.concat(F.col(col), F.lit(f"#{i}"))), F.lit(m_bits))
        out = (
            out.withColumn(f"_w{i}", (p / 64).cast("long"))
            .withColumn(f"_b{i}", F.pmod(p, F.lit(64)).cast("int"))
            .join(
                bw.select(F.col("widx").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")),
                f"_w{i}",
                "left",
            )
            .filter(
                F.coalesce(
                    F.call_function("getbit", F.col(f"_bits{i}"), F.col(f"_b{i}")),
                    F.lit(0),
                )
                == 1
            )
        )
    return out.drop(*[c for i in range(k) for c in (f"_w{i}", f"_b{i}", f"_bits{i}")])
