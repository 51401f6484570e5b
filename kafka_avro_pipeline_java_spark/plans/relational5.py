"""Relational completeness round-out: UNPIVOT (wide→long melt, the
inverse of the pivot query in relational2), the distribution window
functions (percent_rank / cume_dist / nth_value) the rank zoo didn't yet
cover, and a CSV connector round-trip putting Spark's text-format
reader/writer on the graded path (the JSON/ORC/partitioned-parquet
siblings are exercised in tests/test_formats.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 1000
    )
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: four lineitem measure columns into long
    (key, measure, value) rows — the inverse of `pivot_status_by_priority`
    and the shape change every metrics store / long-format ML feature
    table needs. Spark's native `unpivot` is a zero-shuffle projection
    (each input row expands in place in the scan stage — no exchange, no
    state), so at 100 TB it is scan-bound; the oracle spells the same
    relation as a portable 4-way UNION ALL. The orderkey slice keeps the
    compared row set bounded; the plan is identical without it."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


@query(
    "window_dist_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_orderkey
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over each customer's orders by
    spend: percent_rank (rank-1)/(n-1), cume_dist, and nth_value(2) with
    the explicit running frame both engines default differently on —
    completing the window surface next to `window_rank_variants`
    (rank/dense_rank/ntile/lead) and `window_range_frame` (RANGE frames).
    Same scale shape as every window query here: one keyed shuffle,
    per-key sort, no global order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_run).alias("second_orderkey"),
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS bal_cents,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer GROUP BY 1
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector on the graded path: write `customer` out as headered
    CSV, read it back, and aggregate per segment — the oracle runs the
    SAME aggregate on the parquet directly, so any loss in the text
    round-trip (double formatting, quoting, header/schema misalignment)
    breaks the value hash. Doubles survive because Spark writes the
    shortest representation that parses back to the identical bits; the
    exact-cents SUM pins it. Read uses an EXPLICIT schema, never
    inference — at 100 TB schema inference is a second full scan, and
    uncompressed CSV stays line-splittable so the read parallelizes like
    any other file scan. The JSON/ORC/partitioned-pruning siblings are
    tests/test_formats.py."""
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        os.path.basename(os.path.normpath(sf_dir)),
        "customer_csv",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    c.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema(
            "c_custkey bigint, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string"
        )
        .option("header", True)
        .csv(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint")).alias(
            "bal_cents"
        ),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


_DOC_AVRO_SCHEMA = {
    "type": "record",
    "name": "document",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
    ],
}


@query(
    "source_avro_ocf_roundtrip",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(BIT_XOR(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
                AS BIGINT) AS text_hash_xor
    FROM documents GROUP BY 1
    """,
)
def source_avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File connector on the graded path: write the
    documents table as a directory of deflate-coded OCF files (one per
    partition, executors in parallel — streaming/avro_ocf.py, built from
    the public Avro 1.11 spec since the spark-avro jar isn't in the
    sandbox), read it back through binaryFile + executor-side container
    parse, and aggregate per source. The per-source BIT_XOR of a 60-bit
    md5 hash over the round-tripped TEXT (xor, not sum — order-free AND
    overflow-free under ANSI mode) means one flipped byte anywhere in
    encode→deflate→sync-framing→inflate→decode breaks the value hash
    against the parquet-side oracle. Reference parity: the reference's
    whole pipeline speaks Confluent-framed Avro (AvroProducer.java:48-50);
    this is the same record codec in its FILE container form."""
    from ..streaming.avro_ocf import read_ocf, write_ocf

    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        os.path.basename(os.path.normpath(sf_dir)),
        "documents_ocf",
    )
    docs = load_table(spark, sf_dir, "documents")
    write_ocf(docs, out, _DOC_AVRO_SCHEMA, codec="deflate")
    back = read_ocf(spark, out, _DOC_AVRO_SCHEMA)
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10)"
            " as bigint))"
        ).alias("text_hash_xor"),
    )


@query(
    "agg_gini_customer_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0)
                                      AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT)
               AS i
      FROM spend
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS tot,
             CAST(SUM(i * cents) AS BIGINT) AS isum
      FROM ranked
    )
    SELECT n AS n_customers,
           ROUND(CAST(2 * isum - (n + 1) * tot AS DOUBLE)
                 / (CAST(n AS DOUBLE) * tot), 6) AS gini
    FROM s
    """,
)
def agg_gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order spend — the inequality /
    concentration audit a data-mixture pipeline runs on its source
    distribution ("is 1% of customers 90% of revenue?"). Uses the sorted
    closed form G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) with cent-exact BIGINT
    spend, so the weighted sum is exact integer algebra (ties in spend
    are safe under any tiebreak: the coefficient sum over a tie run is
    order-invariant, and the custkey tiebreak makes ROW_NUMBER
    deterministic anyway). One keyed agg, then the global rank comes
    from the TWO-PHASE range-partitioned scan
    (operators/ranking.py::attach_global_order_stats) — customers scale
    WITH the corpus, so a bare Window.orderBy would be a billion-row
    single-partition sort at 100 TB; the two-phase form keeps every
    partition at its range slice."""
    from ..operators.ranking import attach_global_order_stats

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    spend = o.groupBy("o_custkey").agg(
        F.sum(cents).cast("bigint").alias("cents")
    )
    ranked = attach_global_order_stats(
        spend,
        [("cents", "asc"), ("o_custkey", "asc")],
        row_number="i",
    ).select("cents", "i")
    # sum((2i - n - 1) x_i) = 2*sum(i*x_i) - (n+1)*sum(x): no second
    # pass (or driver count) to learn n before weighting
    s = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("isum"),
    )
    n, tot = F.col("n"), F.col("tot")
    return s.select(
        n.alias("n_customers"),
        F.round(
            (2 * F.col("isum") - (n + 1) * tot).cast("double")
            / (n.cast("double") * tot),
            6,
        ).alias("gini"),
    )


@query(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk(part, anc, depth) AS (
      SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey % 97 = 0
      UNION ALL
      SELECT part, anc // 2, depth + 1 FROM walk WHERE anc > 1
    )
    SELECT part, CAST(MAX(depth) AS INT) AS depth_to_root,
           CAST(SUM(anc) AS BIGINT) AS path_sum
    FROM walk GROUP BY part
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — new engine surface in Spark 4)
    walking the implicit binary-tree hierarchy part → part÷2 → … → 1 for
    every 97th part: per-part depth-to-root and exact ancestor-key path
    sum — the org-chart / BOM-explosion query shape, expressed as ONE
    SQL statement that BOTH engines execute natively (the only dialect
    difference is integer division: DIV vs //). Each seed's chain is
    ⌈log₂ key⌉ rows, so the recursion's working set is seeds×depth —
    bounded, no cycle risk, no path multiplication (contrast the
    unrolled-CTE oracles used for the graph family, which exist because
    UNION ALL recursion over a CYCLIC clique-dense graph would multiply
    paths; on a tree the recursion is the natural form)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("""
      WITH RECURSIVE walk(part, anc, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey % 97 = 0
        UNION ALL
        SELECT part, anc DIV 2, depth + 1 FROM walk WHERE anc > 1
      )
      SELECT part, CAST(MAX(depth) AS INT) AS depth_to_root,
             CAST(SUM(anc) AS BIGINT) AS path_sum
      FROM walk GROUP BY part
    """)


@query(
    "join_right_outer_nation_suppliers",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right_outer_nation_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RIGHT OUTER join — the one outer-join direction the catalog's
    inner/left/semi/anti/full zoo didn't yet spell out: every nation with
    its supplier count, nations with NO suppliers kept at 0 (COUNT over
    the nullable key, not COUNT(*), so preserved-but-unmatched rows count
    zero — the classic right-join footgun). Nation is loaded WITHOUT the
    catalog's automatic broadcast hint: as the preserved side of a right
    outer join it cannot be the build side, and the unusable hint only
    produces a HintErrorLogger warning. Catalyst still picks a broadcast
    of the streamed supplier stats once AQE sees the sizes."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation", hint_broadcast=False)
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").cast("bigint").alias("n_suppliers"))
    )


@query(
    "agg_exact_quartiles_price",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), cum AS (
      SELECT v, c,
             CAST(COALESCE(SUM(c) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS below,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM vals
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN below < (n + 3) // 4
                          AND (n + 3) // 4 <= below + c
                     THEN v ELSE 0 END) AS BIGINT) AS q1_cents,
           CAST(SUM(CASE WHEN below < (n + 1) // 2
                          AND (n + 1) // 2 <= below + c
                     THEN v ELSE 0 END)
                + SUM(CASE WHEN below < (n + 2) // 2
                            AND (n + 2) // 2 <= below + c
                      THEN v ELSE 0 END) AS BIGINT) AS median2_cents,
           CAST(SUM(CASE WHEN below < (3 * n + 3) // 4
                          AND (3 * n + 3) // 4 <= below + c
                     THEN v ELSE 0 END) AS BIGINT) AS q3_cents
    FROM cum
    """,
)
def agg_exact_quartiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quartiles of l_extendedprice — the precise
    counterpart of the rows-only `approx_percentile_prices`: quantiles
    by ORDER-STATISTIC SELECTION over the cent-value HISTOGRAM, never a
    global row sort. One keyed count to the distinct-value domain, one
    cumulative window over it, then each quartile is "the value whose
    cumulative range covers rank ⌈q·n⌉" — a CASE-gated SUM (exactly one
    value qualifies per rank by construction). Q1/Q3 use the symmetric
    type-1 ranks ⌈n/4⌉ = (n+3)//4 and ⌈3n/4⌉ = (3n+3)//4
    (lower order statistic), the median carries both middle
    ranks as an exact-integer 2·median — the repo's selection-not-
    interpolation discipline (events_mad_anomaly). At 100 TB the ordered
    pass is over distinct cents (value-domain-bounded); contrast
    percentile_approx, whose sketch error this query measures."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint").alias("below"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    n = F.col("n")

    def pick(rank):
        hit = (F.col("below") < rank) & (rank <= F.col("below") + F.col("c"))
        return F.sum(F.when(hit, F.col("v")).otherwise(0)).cast("bigint")

    return cum.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        pick(F.floor((n + 3) / 4)).alias("q1_cents"),
        (
            pick(F.floor((n + 1) / 2)) + pick(F.floor((n + 2) / 2))
        ).cast("bigint").alias("median2_cents"),
        pick(F.floor((3 * n + 3) / 4)).alias("q3_cents"),
    )


@query(
    "scalar_datetime_zoo",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start
    FROM orders WHERE o_orderkey < 200
    """,
)
def scalar_datetime_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar-function matrix — the date/time companion to
    scalar_string_zoo: extract fields (year/quarter/month/day/doy),
    day-of-week ALIGNED across engines (Spark's dayofweek is 1-based
    Sunday-first, DuckDB's is 0-based — the oracle adds 1; convention
    drift here is the classic silent BI bug this row pins), ISO week,
    month-end, interval arithmetic, and quarter truncation. Pure
    projection — codegen, no shuffle, scan pruned to two columns."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("int").alias("y"),
        F.quarter(d).cast("int").alias("qtr"),
        F.month(d).cast("int").alias("mon"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.dayofweek(d).cast("int").alias("dow_sun1"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.last_day(d).cast("date").alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.date_trunc("quarter", d).cast("date").alias("qtr_start"),
    )


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS price_cents,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY 1
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines connector on the graded path, completing the text-format
    trio next to source_csv_roundtrip and source_avro_ocf_roundtrip:
    write `orders` as line-delimited JSON, read it back with an EXPLICIT
    schema (inference = a second full scan at 100 TB), aggregate per
    status against the parquet-side oracle. Timestamps round-trip through
    JSON's ISO strings and doubles through shortest-round-trip notation;
    the exact-cents SUM and key MIN/MAX pin any loss. JSONL stays
    line-splittable, so the read parallelizes like CSV."""
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_formats",
        os.path.basename(os.path.normpath(sf_dir)),
        "orders_jsonl",
    )
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "price_cents"
        ),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "join_bloom_runtime_filter",
    oracle="""
    WITH urgent AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
      SELECT DISTINCT
        CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#' || i.i),
                             1, 15)) AS BIGINT) % 1048576 AS pos
      FROM urgent, UNNEST(range(0, 3)) AS i(i)
    ),
    li AS (SELECT l_orderkey, l_extendedprice FROM lineitem),
    passed AS (
      SELECT l.l_orderkey, l.l_extendedprice
      FROM li l
      WHERE NOT EXISTS (
        SELECT 1 FROM UNNEST(range(0, 3)) AS i(i)
        WHERE CAST(('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR)
                                       || '#' || i.i), 1, 15)) AS BIGINT)
              % 1048576 NOT IN (SELECT pos FROM bits)
      )
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM li) AS n_lineitem,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM passed) AS n_bloom_passed,
           CAST(COUNT(*) AS BIGINT) AS n_joined,
           CAST(SUM(CAST(ROUND(p.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM passed p JOIN urgent u ON u.o_orderkey = p.l_orderkey
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual RUNTIME-FILTER join: revenue of URGENT orders' lineitems
    with the fact side pre-filtered by a Bloom filter built from the
    dimension's join keys BEFORE the exact join — the technique engines
    call runtime filtering / dynamic semi-join pushdown, spelled out
    relationally so it survives any planner: build-side keys hash to a
    DISTINCT-positions table (m=2^20, k=3, md5-portable), the fact probes
    it with an anti-join on missing positions (a key passes iff none of
    its k bits is absent), and only survivors reach the exact join. The
    emitted counts value-check the MECHANISM, not just the answer: the
    false-positive overshoot n_bloom_passed − n_joined is exactly
    reproduced by the oracle because the hash is portable. At 100 TB the
    positions table is m-bounded (not key-bounded), the probe is a
    shuffle-free-broadcast-eligible join, and the exact join's shuffle
    shrinks by the Bloom's selectivity — the point of the pattern."""
    from ..functions.hashing import portable_hash64

    m_bits, k = 1 << 20, 3
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
    )

    def positions(col):
        return [
            F.pmod(
                portable_hash64(
                    F.concat(col.cast("string"), F.lit(f"#{i}"))
                ),
                F.lit(m_bits),
            )
            for i in range(k)
        ]

    bits = urgent.select(
        F.explode(F.array(*positions(F.col("o_orderkey")))).alias("pos")
    ).distinct()
    # r13: probe the DISTINCT key domain, not every fact row — the k=3
    # md5 positions are a function of l_orderkey alone, so hashing per
    # lineitem row computed ~4× the hashes for the identical `missing`
    # set (guide §2.2 shuffle fewer bytes / §4 pass only what the
    # function needs). `missing` (one bigint column, key-domain-sized)
    # is lazily checkpointed: both `passed` consumers ride broadcast
    # anti-joins, which defeat exchange reuse, so without the cut the
    # whole probe pipeline re-derived per consumer (guide §2.4).
    keys = li.select("l_orderkey").distinct()
    probe = keys.select(
        "l_orderkey",
        F.posexplode(F.array(*positions(F.col("l_orderkey")))),
    ).select("l_orderkey", F.col("col").alias("pos"))
    missing = (
        probe.join(bits, "pos", "left_anti")
        .select("l_orderkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    passed = li.join(missing, "l_orderkey", "left_anti")
    joined = passed.join(
        urgent, passed.l_orderkey == urgent.o_orderkey
    )
    summary = (
        li.agg(F.count("*").cast("bigint").alias("n_lineitem"))
        .crossJoin(
            passed.agg(F.count("*").cast("bigint").alias("n_bloom_passed"))
        )
        .crossJoin(
            joined.agg(
                F.count("*").cast("bigint").alias("n_joined"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                ).cast("bigint").alias("revenue_cents"),
            )
        )
    )
    return summary


@query(
    "sql_skyline_parts",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, p_size,
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents
      FROM part
    ), ranked AS (
      SELECT p_partkey, p_size, price_cents,
             MIN(price_cents) OVER (
               ORDER BY p_size DESC, price_cents ASC, p_partkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_price_larger
      FROM pts
    )
    SELECT p_partkey, CAST(p_size AS INT) AS p_size, price_cents
    FROM ranked
    WHERE best_price_larger IS NULL OR price_cents < best_price_larger
    """,
)
def sql_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto-frontier operator: parts not DOMINATED on
    (maximize size, minimize price) — no other part is at least as large
    AND at least as cheap with one strict. The classic engine feature the
    join/agg zoo doesn't express directly, computed in O(n log n) with
    the sort-sweep: order by size DESC (price ASC tie-break), keep the
    running best (min) price among everything larger-or-equal-so-far; a
    row survives iff it strictly beats that. The ASC price tie-break
    makes equal-size groups self-dominate correctly (only the cheapest
    of a size can survive, and ties-in-both-dims keep the first — the
    p_partkey third key pins WHICH first deterministically in both
    engines, since the survivor's key is part of the output). The sweep
    runs over the PART dimension, which scales with the corpus, so the
    running min comes from the two-phase range-partitioned scan
    (operators/ranking.py::attach_global_order_stats cummin_excl — min
    is associative, the cross-partition carry is one literal per
    partition) instead of a single-partition window; prices exact
    cents."""
    from ..operators.ranking import attach_global_order_stats

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("int").alias("p_size"),
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias(
            "price_cents"
        ),
    )
    ranked = attach_global_order_stats(
        p,
        [("p_size", "desc"), ("price_cents", "asc"), ("p_partkey", "asc")],
        cummin_excl=("price_cents", "best_price_larger"),
    )
    return ranked.filter(
        F.col("best_price_larger").isNull()
        | (F.col("price_cents") < F.col("best_price_larger"))
    ).select("p_partkey", "p_size", "price_cents")


@query(
    "scalar_bitwise_zoo",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 15 AS BIGINT) AS or_mask,
           CAST(xor(o_orderkey, 6148914691236517205) AS BIGINT) AS xor_pat,
           CAST(o_orderkey << 3 AS BIGINT) AS shl3,
           CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_bitwise_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar-function matrix — AND/OR/XOR masks, shifts, and
    popcount over order keys: the bit-twiddling surface behind every
    hash/bucket/bitmap technique in this repo (Z-order interleaving,
    Bloom positions, SimHash bands) exposed as a driver-checked row so
    the two engines' operator semantics (arithmetic shift, 64-bit XOR
    pattern, bit_count) are pinned against each other. Pure codegen
    projection, scan pruned to one column."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(15)).cast("bigint").alias("or_mask"),
        k.bitwiseXOR(F.lit(6148914691236517205)).cast("bigint").alias(
            "xor_pat"
        ),
        F.shiftleft(k, 3).cast("bigint").alias("shl3"),
        F.shiftright(k, 2).cast("bigint").alias("shr2"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


_I64_MAX = 9223372036854775807
_P62 = 1 << 62


@query(
    "scalar_try_arithmetic_zoo",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                     / (o_orderkey % 3) END AS div_or_null,
           CASE WHEN o_orderkey % 2 = 1 THEN NULL
                ELSE {_I64_MAX} END AS add_overflow,
           CASE WHEN o_orderkey % 4 IN (0, 1)
                THEN {_P62} * (o_orderkey % 4) ELSE NULL END AS mult_overflow,
           TRY_CAST(o_orderpriority AS INT) AS priority_cast,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_digit,
           string_split(o_orderpriority, '-')[5] AS elem_oob
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_try_arithmetic_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_-family error-free arithmetic matrix — the NULL-on-failure
    semantics an ANSI-mode pipeline needs pinned before it can trust a
    100 TB run not to die on one bad row: try_divide by a sometimes-zero
    denominator, try_add at int64 max (overflow → NULL, not wraparound),
    try_multiply crossing 2⁶³, try_cast of a non-numeric string, and an
    out-of-bounds try_element_at. The oracle hand-encodes the EXPECTED
    outcome of each probe (DuckDB's operators error rather than
    null-out, so the CASE forms are the semantic spec, not a mirror of
    convenience) — making this a driver-checked conformance row, same
    spirit as scalar_bitwise_zoo. Pure codegen projection, scan pruned
    by the pushed o_orderkey filter."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return o.select(
        "o_orderkey",
        F.try_divide(cents, F.col("o_orderkey") % 3).alias("div_or_null"),
        F.try_add(
            F.lit(_I64_MAX), F.col("o_orderkey") % 2
        ).alias("add_overflow"),
        F.try_multiply(
            F.lit(_P62), F.col("o_orderkey") % 4
        ).alias("mult_overflow"),
        F.col("o_orderpriority").try_cast("int").alias("priority_cast"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias(
            "priority_digit"
        ),
        F.try_element_at(
            F.split("o_orderpriority", "-"), F.lit(5)
        ).alias("elem_oob"),
    )
