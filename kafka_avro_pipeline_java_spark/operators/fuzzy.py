"""Edit-distance (fuzzy) deduplication with prefix blocking.

Completes the dedup family (exact / n-gram Jaccard / MinHash / SimHash /
embedding — see operators/dedup.py) with the character-level measure: two
documents are fuzzy duplicates when their normalized texts are within a
bounded Levenshtein distance. Character edits catch OCR noise, typo-level
mutations, and template fills that token-set measures blur together.

100 TB shape: Levenshtein is O(len²) per pair, so the operator NEVER scores
all pairs. Candidates come from an equi-join on a cheap blocking key (the
first ``prefix_tokens`` normalized tokens), prefiltered by the length bound
|len(a) − len(b)| ≤ k that any distance-≤-k pair must satisfy, and verified
with Spark's banded ``levenshtein(l, r, threshold)`` (gives up and returns
-1 once the running distance exceeds k — O(k·len) not O(len²)). The block
join is a shuffle equi-join whose per-key fan-out is bounded by the block
size, exactly the inverted-index discipline of dedup.py::ngram_jaccard_pairs;
skewed blocks (boilerplate openings) are the same heavy-hitter problem and
can reuse dedup.cap_doc_freq on the block key.

Blocking recall tradeoff (documented, deliberate): a pair mutated inside its
first ``prefix_tokens`` tokens lands in different blocks and is missed —
standard prefix-blocking behavior (record-linkage practice is to union
several complementary blocking keys; head-mutated pairs are caught by the
length+shingle blocks of the Jaccard/MinHash passes this operator
complements). The operator's SEMANTICS are therefore "same block AND edit
distance ≤ k", which is what the DuckDB oracle replicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def _norm(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.trim(F.lower(c))


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_dist: int = 20,
    prefix_tokens: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) in the same prefix block whose normalized texts
    are within ``max_dist`` Levenshtein edits. Returns
    (id_a, id_b, edit_dist).

    ``max_block_size`` is the heavy-hitter guard (the fuzzy twin of
    dedup.cap_doc_freq): a block shared by d documents contributes d²
    candidate pairs, and BOILERPLATE OPENINGS concentrate exactly there —
    measured 25M candidates (85 s of Levenshtein) from ~50 shared-opening
    blocks in a 500k-doc corpus where every other block held ≤ a few
    docs; capping at 100 cut the pass to ~8 s. Dropped blocks lose only
    boilerplate-headed pairs, which the shingle-based passes
    (Jaccard/MinHash, immune to opening skew) already catch — same
    division of labor as the documented prefix-blocking recall note."""
    norm = _norm(text_col)
    blk = F.array_join(F.slice(T.tokens(norm), 1, prefix_tokens), " ")
    side = df.select(
        F.col(id_col).alias("id"),
        norm.alias("t"),
        F.length(norm).alias("n"),
        blk.alias("blk"),
    )
    if max_block_size is not None:
        # the counts branch re-tokenizes the corpus once (~2 s at 500k) to
        # shuffle ONLY the blk strings; the heavy list is realistically a
        # handful of boilerplate heads but O(corpus/K) in the DEGENERATE
        # worst case, so NO mandatory broadcast hint (the repo scale
        # guard, tests/test_plan_properties.py) — AQE broadcasts it at
        # runtime when it is actually small
        heavy = (
            side.groupBy("blk")
            .agg(F.count("*").alias("_c"))
            .filter(F.col("_c") > max_block_size)
            .select("blk")
        )
        side = side.join(heavy, "blk", "left_anti")
    # Measured and NOT adopted: the same trick for SINGLETON blocks
    # (semi-join to multi-member blocks before the text shuffle) — the
    # re-scan cancels the ~10× smaller shuffle on local disk (14.2 s vs
    # 15.2 s at 200k docs); worth resurrecting only when shuffle bytes
    # dominate (network shuffle) via a materialized (id, blk) projection.
    # a broadcast join keeps the streamed side's partitioning, and a small
    # input (one parquet file) would run every levenshtein in ONE task —
    # spread the streamed side first (measured 3.3 s → sub-second at 5k
    # docs; at real scale the scan is already many-partition and the join
    # is a sort-merge on blk, where this repartition feeds the shuffle).
    par = df.sparkSession.sparkContext.defaultParallelism
    a = side.repartition(par, "blk").select(
        F.col("id").alias("id_a"), F.col("t").alias("t_a"),
        F.col("n").alias("n_a"), "blk",
    )
    b = side.select(
        F.col("id").alias("id_b"), F.col("t").alias("t_b"),
        F.col("n").alias("n_b"), "blk",
    )
    # the cheap id/length prunes AND the banded verify all live in the join
    # condition, cheap-first: a conjunct list keeps its order in the join
    # residual, whereas a post-join .filter gets merged IN FRONT of the
    # cheap conjuncts and runs the levenshtein on every same-block pair
    # (observed: residual `levenshtein(...) >= 0 AND id_a < id_b AND ...`).
    dist = F.levenshtein("t_a", "t_b", max_dist)
    joined = a.join(
        b,
        (a.blk == b.blk)
        & (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist)
        & (dist >= 0),
    )
    return joined.select("id_a", "id_b", dist.alias("edit_dist"))


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro–Winkler similarity, written to BIT-FOR-BIT match DuckDB's
    ``jaro_winkler_similarity`` (fuzzed to 0 diffs over 8k random string
    pairs incl. forced shared prefixes — tests/test_fuzzy.py): Jaro with
    the standard match window ⌊max(n1,n2)/2⌋−1, transpositions halved,
    then the Winkler boost p=0.1 over the ≤4-char common prefix applied
    only when Jaro > 0.7; either side empty → 0.0 (DuckDB's convention,
    including for two empties)."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(max(n1, n2) // 2 - 1, 0)
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0
    if j > 0.7:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * 0.1 * (1.0 - j)
    return j


def jaro_winkler_batch(left, right):
    """Numpy-vectorized Jaro–Winkler over a BATCH of string pairs —
    bit-for-bit equal to the scalar ``jaro_winkler`` above (the parity
    fuzz in tests/test_fuzzy.py is the gate). Strings of ≤ 64 chars fit
    a uint64 BITSET per row: one packed (row, i) → "positions j of s2
    equal to s1[i]" equality-bitmask tensor up front, then the greedy
    match loop iterates over the ≤ 64 character POSITIONS doing a
    handful of uint64 ops per row — window mask & equality mask &
    ~matched, isolate lowest set bit (cand & −cand), OR it in. The
    equality masks are built per POSITION as contiguous (rows, 64)
    compares (numpy's stride-0 broadcast (rows, L, L) tensor skips SIMD
    and measured ~65× slower), so the whole kernel is an O(L)-step loop
    of flat array ops — measured 3.4× over the scalar loop on 20k
    64-char candidate pairs. Rows longer than 64 chars take the scalar kernel
    (jaro_winkler_pairs scores 64-char heads, so the hot path never
    does). ``left``/``right`` are sequences of str/None; returns a
    float64 ndarray (None/empty on either side → 0.0, DuckDB's
    convention)."""
    import numpy as np

    n = len(left)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    idx = []
    for i in range(n):
        a, b = left[i], right[i]
        if a is None or b is None or len(a) == 0 or len(b) == 0:
            continue  # stays 0.0
        if len(a) > 64 or len(b) > 64:
            out[i] = jaro_winkler(a, b)  # rare slow path, exact
        else:
            idx.append(i)
    if not idx:
        return out
    ls = [left[i] for i in idx]
    rs = [right[i] for i in idx]
    m_rows = len(idx)
    n1 = np.array([len(s) for s in ls], dtype=np.int64)
    n2 = np.array([len(s) for s in rs], dtype=np.int64)
    L = int(max(n1.max(), n2.max()))
    SENT1 = np.uint32(0x110000)  # above any Unicode codepoint
    SENT2 = np.uint32(0x110001)  # distinct pads: pad never equals pad
    A = np.full((m_rows, L), SENT1, dtype=np.uint32)
    # B carries 64 columns so packbits emits exactly one uint64 per row
    B = np.full((m_rows, 64), SENT2, dtype=np.uint32)
    for r, s in enumerate(ls):
        A[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for r, s in enumerate(rs):
        B[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    match_dist = np.maximum(np.maximum(n1, n2) // 2 - 1, 0)
    ones = ~np.uint64(0)
    u1 = np.uint64(1)
    # low_mask[k] = bits [0, k) set, k in 0..64
    low_mask = np.zeros(65, dtype=np.uint64)
    for k in range(1, 65):
        low_mask[k] = low_mask[k - 1] | (u1 << np.uint64(k - 1))
    matched2 = np.zeros(m_rows, dtype=np.uint64)
    m1 = np.zeros((m_rows, L), dtype=bool)
    matches = np.zeros(m_rows, dtype=np.int64)
    for i in range(L):
        active = i < n1
        if not active.any():
            break
        lo = np.maximum(0, i - match_dist)
        hi = np.minimum(n2, i + match_dist + 1)
        window = low_mask[hi] & ~low_mask[lo]
        # contiguous (rows, 64) compare + packbits beats precomputing the
        # (rows, L, L) broadcast tensor ~65x: numpy's stride-0 broadcast
        # inner loop skips SIMD, the flat compare doesn't
        eq_i = B == A[:, i : i + 1]
        eqbits_i = np.packbits(eq_i, axis=1, bitorder="little").view(
            np.uint64
        )[:, 0]
        cand = eqbits_i & window & ~matched2
        cand[~active] = 0
        # lowest set bit == first unmatched equal char in the window
        low = cand & (ones - cand + u1)  # cand & (-cand) in uint64
        found = cand != 0
        matched2 |= low
        m1[:, i] = found
        matches += found
    # transpositions: the k-th matched char of s1 vs the k-th of s2
    m2 = (
        np.unpackbits(
            matched2[:, None].view(np.uint8), axis=1, bitorder="little"
        )[:, :L]
        .astype(bool)
    )
    C1 = np.full((m_rows, L), SENT1, dtype=np.uint32)
    C2 = np.full((m_rows, L), SENT2, dtype=np.uint32)
    r1 = np.cumsum(m1, axis=1) - 1
    r2 = np.cumsum(m2, axis=1) - 1
    rr1, cc1 = np.nonzero(m1)
    C1[rr1, r1[rr1, cc1]] = A[rr1, cc1]
    rr2, cc2 = np.nonzero(m2)
    C2[rr2, r2[rr2, cc2]] = B[rr2, cc2]
    # equal match counts ⇒ positions past `matches` hold SENT1 vs SENT2 on
    # both, so compare only slots below the per-row match count
    slot = np.arange(L, dtype=np.int64)[None, :]
    diff = (C1 != C2) & (slot < matches[:, None])
    t = (diff.sum(axis=1) // 2).astype(np.float64)
    mf = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # identical IEEE expression tree to the scalar kernel
        j = (mf / n1 + mf / n2 + (mf - t) / mf) / 3.0
    j = np.where(matches > 0, j, 0.0)
    # Winkler boost: common prefix (≤ 4 chars, within both lengths)
    pl = min(4, L)
    kk = np.arange(pl, dtype=np.int64)[None, :]
    preq = (
        (A[:, :pl] == B[:, :pl]) & (kk < n1[:, None]) & (kk < n2[:, None])
    )
    lpre = np.cumprod(preq, axis=1).sum(axis=1).astype(np.float64)
    j = np.where(j > 0.7, j + lpre * 0.1 * (1.0 - j), j)
    out[idx] = j
    return out


def jaro_winkler_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    prefix_tokens: int = 2,
    score_chars: int = 64,
    max_block_size: int | None = None,
) -> DataFrame:
    """Jaro–Winkler near-match pairs (id_a < id_b, same prefix block):
    the record-linkage / entity-resolution scorer that complements
    Levenshtein above — prefix-weighted, length-normalized, built for
    the short keys (names, titles, template heads) where edit counts
    mislead. Scores the first ``score_chars`` chars of the normalized
    text (JW is a short-string measure; a 64-char head IS the
    title/template signature, and it bounds the per-pair cost). Returns
    (id_a, id_b, jw_sim rounded to 6).

    Same blocking discipline as fuzzy_pairs (equi-join on the
    ``prefix_tokens`` head, optional heavy-block cap) — the length prune
    does NOT apply (JW compares unequal lengths by design). The scorer
    runs as an Arrow-batched pandas UDF in the join projection: the
    candidate generation stays a JVM shuffle equi-join; Python touches
    only the surviving block pairs, ~64-char strings scored by the
    numpy-vectorized jaro_winkler_batch kernel (bit-identical to the
    scalar reference — the tests/test_fuzzy.py parity fuzz is the
    gate)."""
    import pandas as pd

    @F.pandas_udf("double")
    def _jw(a, b):
        return pd.Series(jaro_winkler_batch(a.tolist(), b.tolist()))

    # r14 (§4.4): the threshold filter references this UDF's column, and
    # the optimizer duplicates the evaluation around the pushed filter —
    # the plan showed TWO ArrowEvalPython nodes scoring _jw(t_a, t_b), so
    # every surviving pair paid the Python kernel twice. Non-deterministic
    # forbids the copy; the function is pure, so values are unchanged.
    _jw = _jw.asNondeterministic()

    norm = _norm(text_col)
    blk = F.array_join(F.slice(T.tokens(norm), 1, prefix_tokens), " ")
    side = df.select(
        F.col(id_col).alias("id"),
        F.substring(norm, 1, score_chars).alias("t"),
        blk.alias("blk"),
    )
    if max_block_size is not None:
        # no mandatory broadcast hint on the heavy list (same scale-guard
        # reasoning as fuzzy_pairs above) — AQE picks broadcast at runtime
        heavy = (
            side.groupBy("blk")
            .agg(F.count("*").alias("_c"))
            .filter(F.col("_c") > max_block_size)
            .select("blk")
        )
        side = side.join(heavy, "blk", "left_anti")
    par = df.sparkSession.sparkContext.defaultParallelism
    a = side.repartition(par, "blk").select(
        F.col("id").alias("id_a"), F.col("t").alias("t_a"), "blk"
    )
    b = side.select(F.col("id").alias("id_b"), F.col("t").alias("t_b"), "blk")
    joined = a.join(b, (a.blk == b.blk) & (F.col("id_a") < F.col("id_b")))
    scored = joined.withColumn("jw", _jw(F.col("t_a"), F.col("t_b"))).filter(
        F.col("jw") >= threshold
    )
    return scored.select("id_a", "id_b", F.round("jw", 6).alias("jw_sim"))
