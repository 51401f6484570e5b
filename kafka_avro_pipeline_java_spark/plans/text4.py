"""Corpus statistics round-out: edit-distance dedup, per-source token
entropy, document-length histogram, and the Zipf rank-frequency slope.

These are the corpus-health dashboards a training-data pipeline watches:
entropy/diversity per ingestion source (a collapsing source = boilerplate
flood), the length distribution that drives packing/chunking parameters,
and the Zipf slope whose deviation from ≈−1 flags synthetic or degenerate
text. Plus the character-level fuzzy dedup that completes the dedup family
(operators/fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..operators import bloom, fuzzy, ranking, spans
from ..sources import load_table
from .registry import query


@query(
    "dedup_fuzzy_edit",
    oracle="""
    WITH b AS (
      SELECT doc_id, trim(lower(text)) AS t, len(trim(lower(text))) AS n,
             array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:2], ' ') AS blk
      FROM documents
    ), heavy AS (
      SELECT blk FROM b GROUP BY blk HAVING COUNT(*) > 100
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.t, c.t) AS INT) AS edit_dist
    FROM b a JOIN b c
      ON a.blk = c.blk AND a.doc_id < c.doc_id AND abs(a.n - c.n) <= 20
    WHERE levenshtein(a.t, c.t) <= 20
      AND a.blk NOT IN (SELECT blk FROM heavy)
    """,
)
def dedup_fuzzy_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level fuzzy duplicate pairs: same 2-token prefix block,
    Levenshtein ≤ 20 on the normalized text — the edit-distance member of
    the dedup family (catches OCR/typo mutations token-set measures miss).
    Block equi-join with the length bound in the join condition, banded
    levenshtein(…, threshold) verify in the projection; per-key fan-out is
    capped at max_block_size=100 (a block of d docs contributes d²
    candidates — boilerplate openings go quadratic inside ONE join key at
    100 TB; the oracle carries the identical HAVING>100 anti-filter, so
    answers stay bit-identical while the d² blowup disappears —
    operators/fuzzy.py heavy-block note)."""
    d = load_table(spark, sf_dir, "documents")
    return fuzzy.fuzzy_pairs(
        d, "text", "doc_id", max_dist=20, prefix_tokens=2, max_block_size=100
    )


@query(
    "pipeline_decontaminate_bloom",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), spans AS (
      SELECT doc_id,
             substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    ), bench AS (
      SELECT DISTINCT h FROM spans WHERE doc_id % 97 = 0
    ), dirty AS (
      SELECT DISTINCT s.doc_id FROM spans s JOIN bench USING (h)
      WHERE s.doc_id % 97 <> 0
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
)
def pipeline_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram decontamination, KEEP side, executed through a Bloom-filter
    prefilter: the eval set's 5-token span hashes are compacted into a
    16 Kbit literal bitmask; every corpus span takes k=3 codegen bit
    probes (no join, no shuffle), and only bloom-POSITIVE spans — true
    overlaps plus ~0.5% false positives — reach the exact verify join.
    Zero false negatives make the final result EXACT (identical semantics
    to the plain anti-join the oracle states); the bloom is purely the
    physical strategy that survives an eval span set too big to broadcast
    as raw hashes (operators/bloom.py design note)."""
    d = load_table(spark, sf_dir, "documents")
    sp = spans.span_table(d, "text", "doc_id", w=5).withColumnRenamed("id", "doc_id")
    is_eval = F.col("doc_id") % 97 == 0
    bench = sp.filter(is_eval).select("span_hash").distinct()
    mask = bloom.bloom_build(bench, "span_hash", m_bits=1 << 14, k=3)
    candidates = (
        sp.filter(~is_eval)
        .filter(bloom.bloom_test(F.col("span_hash"), mask, k=3))
    )
    dirty = (
        candidates.join(bench, "span_hash", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(~is_eval)
        .join(dirty, "doc_id", "left_anti")
        .select("doc_id")
    )


@query(
    "text_source_entropy",
    oracle="""
    WITH toks AS (
      SELECT source, t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), counts AS (
      SELECT source, tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM toks GROUP BY 1, 2
    ), withp AS (
      SELECT source, c, c / SUM(c) OVER (PARTITION BY source) AS p
      FROM counts
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS INT) AS vocab,
           ROUND(-SUM(p * LN(p)), 6) AS entropy
    FROM withp
    GROUP BY source
    """,
)
def text_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per ingestion source, with
    token and vocabulary counts — the diversity dashboard that catches a
    source collapsing into boilerplate (entropy drops) before the dedup
    bill does. Word-count-shaped partial aggregation, then one per-source
    window + final agg over the (source, token)-sized table — all shuffles
    are on keys whose cardinality shrinks with aggregation, never the raw
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    tot = F.sum("c").over(Window.partitionBy("source"))
    p = (F.col("c") / tot)
    return (
        counts.withColumn("plnp", p * F.log(p))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("int").alias("vocab"),
            F.round(-F.sum("plnp"), 6).alias("entropy"),
        )
    )


@query(
    "text_length_histogram",
    oracle="""
    WITH lens AS (
      SELECT doc_id, len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT CAST((n_tokens // 10) * 10 AS INT) AS bucket,
           CAST(COUNT(*) AS INT) AS n_docs,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
    FROM lens
    GROUP BY 1
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (token count, width-10 buckets) with mean
    character length per bucket — the distribution that sets token-packing
    sequence length and chunking windows (operators/packing.py). One
    projection + one tiny aggregation; at 100 TB this is the cheapest
    corpus scan there is (two columns, full pushdown)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(T.tokens(F.lower(F.col("text"))))
    return (
        d.select(
            (F.floor(n_tok / 10) * 10).cast("int").alias("bucket"),
            F.col("n_chars").cast("double").alias("n_chars"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "text_zipf_slope",
    oracle="""
    WITH counts AS (
      SELECT t.tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      GROUP BY t.tok
    ), top AS (
      SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 500
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM top
    )
    SELECT ROUND(COVAR_POP(LN(r), LN(c)) / VAR_POP(LN(r)), 6) AS zipf_slope,
           CAST(COUNT(*) AS INT) AS n_ranks
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope: least-squares slope of ln(freq) on
    ln(rank) over the top-500 token ranks. Natural text sits near −1;
    synthetic, templated, or degenerate corpora drift toward 0 (flat) or
    below −1.5 (spiked) — a one-number corpus-health gate. Token counts are
    a word-count aggregate; the top-500 selection is a distributed
    TakeOrdered (never a global sort of the vocabulary), and the rank
    window runs on 500 rows. Slope via covar_pop/var_pop — the same closed
    form the oracle uses, so the driver hash matches exactly."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    top = counts.orderBy(F.desc("c"), "tok").limit(500)
    ranked = top.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "tok")).alias("r"),
    )
    lr, lc = F.log("r"), F.log("c")
    return ranked.agg(
        F.round(F.covar_pop(lr, lc) / F.var_pop(lr), 6).alias("zipf_slope"),
        F.count("*").cast("int").alias("n_ranks"),
    )


_QUALITY_SQL = """ROUND(0.5 * least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
                             / 100.0, 1.0)
               + 0.5 * (1.0 - (length(text)
                               - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                              / CAST(length(text) AS DOUBLE)), 4)"""


@query(
    "text_quality_calibrated",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents
    )
    SELECT doc_id, quality,
           ROUND(PERCENT_RANK() OVER (ORDER BY quality, doc_id), 6) AS pct_rank,
           CAST(NTILE(10) OVER (ORDER BY quality, doc_id) AS INT) AS decile
    FROM q
    """,
)
def text_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score calibration: raw quality scores mapped to corpus-relative
    percentile ranks and deciles — the form a mixing policy consumes
    ("keep the top 30%"), robust to the raw score's arbitrary scale.
    Deterministic cross-engine via the (quality, doc_id) tiebreak. The
    corpus-relative rank comes from the two-phase range-partitioned
    scan (operators/ranking.py::attach_global_order_stats) — documents
    scale WITH the corpus, so a bare global window would single-
    partition a billion-row sort at 100 TB; the two-phase form keeps
    every partition at its range slice and reproduces PERCENT_RANK and
    NTILE bit-for-bit."""
    from ..operators.ranking import attach_global_order_stats

    d = load_table(spark, sf_dir, "documents")
    q = d.select("doc_id", T.quality_score("text").alias("quality"))
    ranked = attach_global_order_stats(
        q,
        [("quality", "asc"), ("doc_id", "asc")],
        percent_rank="__pr",
        ntile=(10, "decile"),
    )
    return ranked.select(
        "doc_id", "quality",
        F.round(F.col("__pr"), 6).alias("pct_rank"),
        "decile",
    )


@query(
    "stats_welch_t_sources",
    oracle=f"""
    WITH q AS (
      SELECT source,
             CAST(ROUND({_QUALITY_SQL} * 10000, 0) AS BIGINT) AS s
      FROM documents
    ), m AS (
      SELECT source,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(s) AS DOUBLE) AS s1,
             CAST(SUM(s * s) AS DOUBLE) AS s2
      FROM q GROUP BY source
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.s1 / a.n AS ma, b.s1 / b.n AS mb,
             (a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n AS va,
             (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n AS vb
      FROM m a JOIN m b ON a.source < b.source
    )
    SELECT src_a, src_b,
           ROUND((ma - mb) / SQRT(va + vb), 6) AS welch_t
    FROM pairs
    """,
)
def stats_welch_t_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch t-statistic for the quality-score gap between
    every pair of ingestion sources — the significance gate behind "is
    source X really worse, or is that noise?". Scores quantize to exact
    integers (×10⁴ of the 4-decimal quality), so Σs and Σs² are
    integer-exact and the t statistic is pure closed-form algebra after a
    source-sized aggregate — identical doubles on both engines. The pair
    join is |sources|², broadcast-trivial at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    s = F.round(T.quality_score("text") * 10000, 0).cast("bigint")
    m = d.select("source", s.alias("s")).groupBy("source").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("s").cast("double").alias("s1"),
        F.sum(F.col("s") * F.col("s")).cast("double").alias("s2"),
    )
    a = m.select(*[F.col(c).alias(f"{c}_a") for c in m.columns])
    b = m.select(*[F.col(c).alias(f"{c}_b") for c in m.columns])
    j = a.join(b, F.col("source_a") < F.col("source_b"))
    ma, mb = F.col("s1_a") / F.col("n_a"), F.col("s1_b") / F.col("n_b")
    va = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    ) / F.col("n_a")
    vb = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    ) / F.col("n_b")
    return j.select(
        F.col("source_a").alias("src_a"),
        F.col("source_b").alias("src_b"),
        F.round((ma - mb) / F.sqrt(va + vb), 6).alias("welch_t"),
    )


@query(
    "dedup_rate_by_source",
    oracle=f"""
    WITH fb AS (
      SELECT doc_id, trim(lower(text)) AS t, len(trim(lower(text))) AS n,
             array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:2], ' ') AS blk
      FROM documents
    ), heavy AS (
      SELECT blk FROM fb GROUP BY blk HAVING COUNT(*) > 100
    ), pairs AS (
      SELECT a.doc_id AS id_a, c.doc_id AS id_b
      FROM fb a JOIN fb c
        ON a.blk = c.blk AND a.doc_id < c.doc_id AND abs(a.n - c.n) <= 20
      WHERE levenshtein(a.t, c.t) <= 20
        AND a.blk NOT IN (SELECT blk FROM heavy)
    ), dup_ids AS (
      SELECT id_a AS doc_id FROM pairs UNION SELECT id_b FROM pairs
    )
    SELECT d.source,
           CAST(COUNT(*) AS INT) AS n_docs,
           CAST(COUNT(u.doc_id) AS INT) AS n_in_dup_pairs,
           ROUND(COUNT(u.doc_id) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
    FROM documents d LEFT JOIN dup_ids u USING (doc_id)
    GROUP BY d.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup dashboard sliced by ingestion source: what fraction of
    each source's documents sit in at least one fuzzy near-dup pair —
    the per-feed duplication rate that decides WHERE to spend dedup
    budget (and which crawler is re-fetching). Reuses the edit-distance
    pair join with the max_block_size=100 heavy-block cap (mirrored in
    the oracle's HAVING>100 anti-filter); the membership set is
    pair-bounded but O(corpus) in the worst case, so it carries NO
    mandatory broadcast hint — AQE broadcasts it when it is actually
    small."""
    d = load_table(spark, sf_dir, "documents")
    pairs = fuzzy.fuzzy_pairs(
        d, "text", "doc_id", max_dist=20, prefix_tokens=2, max_block_size=100
    )
    # r14: the old two-select union consumed `pairs` twice, re-running the
    # whole prefix-block + levenshtein pair join for each endpoint column
    # (18 parquet scans in the plan). Exploding both endpoints out of ONE
    # pass over the pair table yields the identical id multiset (§2.4).
    dup_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    flagged = d.join(
        dup_ids.withColumn("_dup", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum(F.coalesce("_dup", F.lit(0))).cast("int").alias("n_in_dup_pairs"),
        F.round(
            F.sum(F.coalesce("_dup", F.lit(0))) / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
    )


@query(
    "text_token_coverage",
    oracle="""
    WITH counts AS (
      SELECT t.tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      GROUP BY t.tok
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r,
             SUM(c) OVER () AS tot,
             SUM(c) OVER (ORDER BY c DESC, tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counts
    )
    SELECT CAST(r AS INT) AS rank_checkpoint,
           ROUND(cum / tot, 6) AS cum_share
    FROM ranked WHERE r IN (1, 5, 10, 20, 50, 100, 500, 1000)
    """,
)
def text_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the cumulative share of all token
    occurrences covered by the top-r tokens, sampled at standard rank
    checkpoints — the statistic that sizes a vocabulary (BPE merge count,
    embedding table) against the mass it actually captures. Counts are a
    word-count agg; the global (count desc, token) rank + running sum run
    through the two-phase distributed scan
    (operators/ranking.py::attach_global_order_stats) — whitespace vocab
    is UNBOUNDED at 100 TB (typos/URLs/numbers push distinct tokens past
    10⁸), so a bare Window.orderBy single-task sort is not acceptable
    here. Counts stay integer-exact (bigint) through the running sum;
    the share division happens once at the 8 surviving checkpoints."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = ranking.attach_global_order_stats(
        counts,
        [("c", "desc"), ("tok", "asc")],
        row_number="r",
        cumsum=("c", "cum"),
    )
    tot = counts.agg(F.sum("c").alias("tot"))
    return (
        ranked.filter(F.col("r").isin(1, 5, 10, 20, 50, 100, 500, 1000))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("int").alias("rank_checkpoint"),
            F.round(F.col("cum") / F.col("tot"), 6).alias("cum_share"),
        )
    )


@query(
    "text_js_divergence_sources",
    oracle="""
    WITH counts AS (
      SELECT source, t.tok, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE source IN ('src0', 'src1')
      GROUP BY 1, 2
    ), tot AS (
      SELECT source, SUM(c) AS n FROM counts GROUP BY 1
    ), vocab AS (
      SELECT DISTINCT tok FROM counts
    ), p AS (
      SELECT s.source, v.tok,
             COALESCE(c.c, 0) / t.n AS p
      FROM (SELECT DISTINCT source FROM counts) s
      CROSS JOIN vocab v
      LEFT JOIN counts c ON c.source = s.source AND c.tok = v.tok
      JOIN tot t ON t.source = s.source
    ), joined AS (
      SELECT a.tok, a.p AS pa, b.p AS pb, (a.p + b.p) / 2 AS m
      FROM p a JOIN p b ON b.tok = a.tok
      WHERE a.source = 'src0' AND b.source = 'src1'
    )
    SELECT ROUND(0.5 * SUM(CASE WHEN pa > 0 THEN pa * LN(pa / m) ELSE 0 END)
               + 0.5 * SUM(CASE WHEN pb > 0 THEN pb * LN(pb / m) ELSE 0 END), 6)
             AS js_divergence,
           CAST(COUNT(*) AS INT) AS vocab_size
    FROM joined
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the token distributions of two
    ingestion sources — the SYMMETRIC, bounded ([0, ln2]) companion to
    the KL split-drift gate, the right measure when neither side is the
    reference. Word-count aggregates + one vocab-sized grid join; zero
    corpus-sized shuffles after the first count."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    # r14: the (source, tok) count table fed the totals, the vocab list
    # and the grid, and the grid was derived once per side — the corpus
    # tokenize ran up to six times (12 parquet scans). Materialize the
    # vocab-scale count table once (the r13 type-count rule) and PIVOT
    # the two sources per token in one groupBy: each (source, tok) has
    # exactly one count row, so the conditional sums reproduce the grid's
    # p values bit for bit, with absent tokens at 0.0 exactly like the
    # grid's coalesce (§2.4).
    counts = (
        d.select("source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    ).localCheckpoint(eager=False)
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    withp = counts.join(F.broadcast(tot), "source").select(
        "tok",
        F.when(F.col("source") == "src0", F.col("c") / F.col("n"))
        .otherwise(F.lit(0.0)).alias("pa0"),
        F.when(F.col("source") == "src1", F.col("c") / F.col("n"))
        .otherwise(F.lit(0.0)).alias("pb0"),
    )
    j = (
        withp.groupBy("tok")
        .agg(F.sum("pa0").alias("pa"), F.sum("pb0").alias("pb"))
        .withColumn("m", (F.col("pa") + F.col("pb")) / 2)
    )
    term = lambda pcol: F.when(  # noqa: E731
        F.col(pcol) > 0, F.col(pcol) * F.log(F.col(pcol) / F.col("m"))
    ).otherwise(F.lit(0.0))
    return j.agg(
        F.round(
            0.5 * F.sum(term("pa")) + 0.5 * F.sum(term("pb")), 6
        ).alias("js_divergence"),
        F.count("*").cast("int").alias("vocab_size"),
    )


@query(
    "text_lexical_richness",
    oracle="""
    WITH toks AS (
      SELECT source, t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS INT) AS n_types,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS type_token_ratio,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS INT) AS n_hapax,
           ROUND(COUNT(*) FILTER (WHERE c = 1) / CAST(COUNT(*) AS DOUBLE), 6)
             AS hapax_rate
    FROM counts GROUP BY source
    """,
)
def text_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per source: type-token ratio and hapax-legomenon
    rate (words seen exactly once) — the vocabulary-health companions to
    entropy: templated feeds crater TTR, OCR noise inflates hapaxes. One
    word-count aggregation, then a source-sized rollup."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    hapax = F.sum((F.col("c") == 1).cast("int"))
    return counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").cast("int").alias("n_types"),
        F.round(F.count("*") / F.sum("c").cast("double"), 6).alias("type_token_ratio"),
        hapax.cast("int").alias("n_hapax"),
        F.round(hapax / F.count("*").cast("double"), 6).alias("hapax_rate"),
    )


@query(
    "pipeline_stage_funnel",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text
      FROM (
        SELECT doc_id, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               {_QUALITY_SQL} AS quality
        FROM documents
      )
      WHERE quality >= 0.5 AND n_tokens BETWEEN 5 AND 100000
    ), fb AS (
      SELECT doc_id, trim(lower(text)) AS t, len(trim(lower(text))) AS n,
             array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:2], ' ') AS blk
      FROM q
    ), fheavy AS (
      SELECT blk FROM fb GROUP BY blk HAVING COUNT(*) > 100
    ), doomed AS (
      SELECT DISTINCT c.doc_id FROM fb a JOIN fb c
        ON a.blk = c.blk AND a.doc_id < c.doc_id AND abs(a.n - c.n) <= 20
      WHERE levenshtein(a.t, c.t) <= 20
        AND a.blk NOT IN (SELECT blk FROM fheavy)
    ), deduped AS (
      SELECT doc_id, text FROM q WHERE doc_id NOT IN (SELECT doc_id FROM doomed)
    ), toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ts
      FROM documents
    ), allspans AS (
      SELECT doc_id, substr(md5(array_to_string(ts[i.i:i.i+4], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(1, len(ts) - 3)) AS i(i)
    ), bench AS (
      SELECT DISTINCT h FROM allspans WHERE doc_id % 97 = 0
    ), dirty AS (
      SELECT DISTINCT s.doc_id FROM allspans s JOIN bench USING (h)
    ), clean AS (
      SELECT doc_id FROM deduped
      WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'raw' AS stage,
             CAST((SELECT COUNT(*) FROM documents) AS INT) AS n_docs
      UNION ALL
      SELECT 2, 'quality_gate', CAST((SELECT COUNT(*) FROM q) AS INT)
      UNION ALL
      SELECT 3, 'fuzzy_dedup_keep_one', CAST((SELECT COUNT(*) FROM deduped) AS INT)
      UNION ALL
      SELECT 4, 'decontaminated', CAST((SELECT COUNT(*) FROM clean) AS INT)
    )
    """,
)
def pipeline_stage_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-yield report: how many documents survive each stage
    of the standard corpus pipeline — raw → quality gate → fuzzy-dedup
    keep-one (min-id survivor of every edit-distance pair among quality
    survivors) → benchmark decontamination (eval docs and any doc
    sharing a 5-token span with the eval set dropped). The number every
    data-curation review starts from, composed entirely from the
    registered operators so every stage count is oracle-checked."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(T.tokens(F.trim(F.col("text"))))
    # r13: the four outputs are COUNTS — only fuzzy_pairs needs TEXT.
    # Materialize the gate's id list once (id-only; the r13 item-10 A/B
    # proved storing the TEXT-carrying stage frames is a loss) and
    # rehydrate text for the fuzzy stage with a semi-join, so the
    # per-doc quality/token scoring runs once instead of once per
    # consumer (count, fuzzy input, dedup anti-join × 2 count paths).
    q_ids = (
        d.filter(
            (F.round(T.quality_score("text"), 4) >= 0.5)
            & n_tok.between(5, 100000)
        )
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    q = d.join(q_ids, "doc_id", "left_semi").select("doc_id", "text")
    pairs = fuzzy.fuzzy_pairs(
        q, "text", "doc_id", max_dist=20, prefix_tokens=2, max_block_size=100
    )
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = q_ids.join(doomed, "doc_id", "left_anti")
    sp = spans.span_table(d, "text", "doc_id", w=5).withColumnRenamed("id", "doc_id")
    # r14 negative (measured, reverted): folding the two span passes into
    # one span_hash-keyed window (dirty = docs whose hash group contains
    # an eval doc) LOST its A/B ~10% — the eval span set is SMALL, so the
    # semi join below is an AQE broadcast that never shuffles sp, while
    # the window forces a full span_hash sort of the corpus span table.
    # The two-pass shape is the right one at any scale for a small eval set.
    bench = sp.filter(F.col("doc_id") % 97 == 0).select("span_hash").distinct()
    dirty = (
        sp.join(bench, "span_hash", "left_semi")
        .select("doc_id").distinct()
    )
    clean = (
        deduped.filter(F.col("doc_id") % 97 != 0)
        .join(dirty, "doc_id", "left_anti")
    )
    spark_counts = [
        (1, "raw", d), (2, "quality_gate", q_ids),
        (3, "fuzzy_dedup_keep_one", deduped), (4, "decontaminated", clean),
    ]
    rows = None
    for no, name, frame in spark_counts:
        one = frame.agg(F.count("*").cast("int").alias("n_docs")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_docs"
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


@query(
    "text_ngram_novelty",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             ts[i.i] || ' ' || ts[i.i + 1] || ' ' || ts[i.i + 2] AS shingle
      FROM tok, UNNEST(range(1, len(ts) - 1)) AS i(i)
      WHERE len(ts) >= 3
    ), firsts AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS INT) AS n_shingles,
           ROUND(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM sh s JOIN firsts f USING (shingle)
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-gram
    shingles whose FIRST corpus occurrence (min doc_id, the ingestion
    order) is this document — the curriculum/data-ordering signal that
    ranks how much genuinely new text each document contributes, and the
    cheap detector for feeds that stop contributing (novelty → 0).
    Shingle first-occurrence is one word-count-shaped agg; the score join
    shuffles on the shingle key, never the corpus rows."""
    d = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import shingle_table

    sh = shingle_table(d, "text", "doc_id", k=3).select(
        F.col("id").alias("doc_id"), "shingle"
    ).distinct()
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count("*").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@query(
    "pipeline_mixture_diversity",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS c FROM documents GROUP BY 1
    ), tot AS (
      SELECT SUM(c) AS n FROM s
    )
    SELECT CAST(COUNT(*) AS INT) AS n_sources,
           ROUND(-SUM((c / n) * LN(c / n)), 6) AS mix_entropy,
           ROUND(EXP(-SUM((c / n) * LN(c / n))), 4) AS effective_sources,
           ROUND(MAX(c) / MAX(n), 6) AS max_source_share
    FROM s, tot
    """,
)
def pipeline_mixture_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-design health in one row: entropy of the source document
    shares, its exponential (the EFFECTIVE number of sources — 20 feeds
    that behave like 3 is a concentration risk), and the heaviest feed's
    share. The number a domain-mix policy (pipeline_domain_mix) is tuned
    against. One source-sized aggregate."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").cast("double").alias("c"))
    tot = s.agg(F.sum("c").alias("n"))
    j = s.crossJoin(F.broadcast(tot))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log(p))
    return j.agg(
        F.count("*").cast("int").alias("n_sources"),
        F.round(ent, 6).alias("mix_entropy"),
        F.round(F.exp(ent), 4).alias("effective_sources"),
        F.round(F.max("c") / F.max("n"), 6).alias("max_source_share"),
    )


# Shared quality weight for the budgeted-selection pair: 0.4·length-term +
# 0.6·token-shape-term, floored at 1e-4 so exponents stay finite. ONE
# definition in each language — pipeline_weighted_sample and
# pipeline_token_budget_selection both consume these, which is what makes
# their "same score" contract real instead of four hand-synced copies.
_QW_SQL = """GREATEST(ROUND(
               0.4 * LEAST(len(string_split_regex(trim(lower(text)), '\\s+')) / 100.0, 1.0)
               + 0.6 * (1.0 - LEAST(ABS(5.5 -
                   (SELECT AVG(len(t.tok)) FROM UNNEST(
                      string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
                   )) / 5.5, 1.0)), 4), 0.0001)"""


def _quality_weight():
    """(tokens_col, weight_col) for the documents ``text`` column."""
    toks = T.tokens(F.trim(F.lower(F.col("text"))))
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda a, t: a + F.length(t)
    ) / F.size(toks)
    w = F.greatest(
        F.round(
            0.4 * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
            + 0.6 * (1.0 - F.least(F.abs(5.5 - mean_len) / 5.5, F.lit(1.0))),
            4,
        ),
        F.lit(0.0001),
    )
    return toks, w


@query(
    "pipeline_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {_QW_SQL} AS w,
             (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wrs'), 1, 15))
                   AS BIGINT) + 1) / 1152921504606846976.0 AS u
      FROM documents
    ), keyed AS (
      SELECT doc_id, source, w,
             ROUND(POWER(u, 1.0 / w), 8) AS k
      FROM scored
    ), ranked AS (
      SELECT doc_id, source, w, k,
             ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS r
      FROM keyed
    )
    SELECT doc_id, source, w, k, CAST(r AS INT) AS r
    FROM ranked WHERE r <= 100
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis–Spirakis A-ES): each document gets key u^(1/w) for a
    quality-derived weight w and the top-100 keys ARE a weighted sample —
    higher-quality docs proportionally more likely, no replacement, one
    TakeOrdered instead of sequential draws. The u is the portable hash
    (not an RNG), so the entire sample is a pure function of the corpus —
    reproducible across engines/runs and value-oracled. The selection IS
    a per-partition top-k + k-row driver merge (orderBy().limit() plans
    TakeOrderedAndProject — Spark does NOT rewrite a rank()<=k filter
    into that, so the rank runs AFTER the limit, over the 100 survivors
    only). This is the quality-WEIGHTED counterpart of
    pipeline_importance_sample's rate-based gate: use this when the
    budget is a COUNT, the gate when it is a RATE."""
    d = load_table(spark, sf_dir, "documents")
    _, w = _quality_weight()
    from ..functions.hashing import portable_hash64

    u = (
        portable_hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit(":wrs"))
        )
        + 1
    ) / F.lit(float(1 << 60))
    keyed = d.select(
        "doc_id",
        "source",
        w.alias("w"),
        F.round(F.pow(u, 1.0 / w), 8).alias("k"),
    )
    from pyspark.sql.window import Window

    # TakeOrderedAndProject: per-partition 100-row heaps + driver merge —
    # no global sort, no full-corpus window at any scale
    top = keyed.orderBy(F.desc("k"), "doc_id").limit(100)
    # the rank is re-derived over the 100 SURVIVORS (bounded window)
    return top.select(
        "doc_id", "source", "w", "k",
        F.row_number()
        .over(Window.orderBy(F.desc("k"), "doc_id"))
        .cast("int")
        .alias("r"),
    )


@query(
    "pipeline_token_budget_selection",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
             {_QW_SQL} AS w
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens, w,
             SUM(n_tokens) OVER (ORDER BY w DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, w,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= 10000
    """,
)
def pipeline_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a 10k-TOKEN budget with the best documents: rank by the
    quality weight (same score as pipeline_weighted_sample), take the
    running token total in that order, keep every doc that still fits —
    the greedy knapsack every 'train on the best N-billion tokens'
    curation step runs (budgets are token counts, not document counts,
    because that is what the training run consumes). Deterministic
    (w desc, doc_id) order makes the selected set oracle-exact. The
    global ordered cumulative sum runs as the TWO-PHASE distributed
    prefix sum (operators/ranking.py — per-range-partition totals,
    broadcast offsets, parallel per-partition windows): documents scale
    with the corpus, so the naive Window.orderBy form would be a
    single-partition walk of the whole corpus at 100 TB."""
    from ..operators.ranking import attach_global_order_stats

    d = load_table(spark, sf_dir, "documents")
    toks, w = _quality_weight()
    scored = d.select(
        "doc_id", F.size(toks).alias("n_tokens"), w.alias("w")
    )
    ranked = attach_global_order_stats(
        scored,
        [("w", "desc"), ("doc_id", "asc")],
        cumsum=("n_tokens", "cum_tokens"),
    ).select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "w",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )
    return ranked.filter(F.col("cum_tokens") <= 10000)


@query(
    "text_readability_by_source",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
             GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS syls
      FROM documents
    ), scored AS (
      SELECT source,
             ROUND(206.835
                   - 1.015 * (CAST(words AS DOUBLE) / sents)
                   - 84.6 * (CAST(syls AS DOUBLE) / words), 4) AS flesch
      FROM per_doc WHERE words > 0
    )
    SELECT source,
           CAST(COUNT(*) AS INT) AS n_docs,
           ROUND(AVG(flesch), 4) AS avg_flesch,
           ROUND(MIN(flesch), 4) AS min_flesch,
           ROUND(MAX(flesch), 4) AS max_flesch
    FROM scored GROUP BY source
    """,
)
def text_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per ingestion source (206.835 − 1.015·words/
    sentences − 84.6·syllables/words, with vowel-group runs as the
    engine-portable syllable proxy and [.!?]+ runs as sentences, both
    floored at 1 so empty-ish docs stay finite) — the readability member
    of the text-quality battery: catches sources drifting into
    keyword-stuffed or run-on machine text that the length/stopword gates
    pass. Pure regexp projections + one per-source agg (scan-speed at
    100 TB — no shuffle beyond the source-keyed rollup); per-doc scores
    are ROUNDED before the avg so both engines aggregate identical
    doubles."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(T.tokens(F.trim(F.lower(F.col("text")))))
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    syls = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ),
        F.lit(1),
    )
    flesch = F.round(
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sents)
        - 84.6 * (syls.cast("double") / words),
        4,
    )
    scored = d.select("source", flesch.alias("flesch")).filter(words > 0)
    return scored.groupBy("source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.round(F.avg("flesch"), 4).alias("avg_flesch"),
        F.round(F.min("flesch"), 4).alias("min_flesch"),
        F.round(F.max("flesch"), 4).alias("max_flesch"),
    )


@query(
    "dedup_jaro_winkler",
    oracle="""
    WITH b AS (
      SELECT doc_id, substr(trim(lower(text)), 1, 64) AS t,
             array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[1:2], ' ') AS blk
      FROM documents
    ), heavy AS (
      SELECT blk FROM b GROUP BY blk HAVING COUNT(*) > 100
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           ROUND(jaro_winkler_similarity(a.t, c.t), 6) AS jw_sim
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE jaro_winkler_similarity(a.t, c.t) >= 0.8
      AND a.blk NOT IN (SELECT blk FROM heavy)
    """,
)
def dedup_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro–Winkler near-match pairs on the 64-char normalized head:
    the entity-resolution scorer (prefix-weighted, built for
    names/titles/template heads) completing the character-level corner
    of the dedup family next to dedup_fuzzy_edit. Candidates come from
    the same 2-token prefix-block equi-join with the max_block_size=100
    heavy-block cap (oracle-mirrored HAVING>100); the scorer is an
    Arrow-batched pandas UDF whose pure-Python kernel is fuzzed
    BIT-FOR-BIT against DuckDB's jaro_winkler_similarity (so the ≥0.8
    threshold cuts identically on both engines —
    operators/fuzzy.py::jaro_winkler)."""
    d = load_table(spark, sf_dir, "documents")
    return fuzzy.jaro_winkler_pairs(
        d, "text", "doc_id", threshold=0.8, prefix_tokens=2, score_chars=64,
        max_block_size=100,
    )
