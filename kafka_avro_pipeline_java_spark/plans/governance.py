"""Data-governance and feature-engineering queries: privacy risk audits
(k-anonymity, l-diversity) and leakage-safe ML feature construction
(leave-one-out target encoding) — the compliance and feature-store passes
a training-data platform runs beside dedup/quality/mixing.

Reference tie-in: none (dkwkehgud77/kafka-avro-pipeline-java is a
Kafka→MySQL ETL with no governance surface); this is north-star depth.
All arithmetic is exact-integer until a final rounded division, so every
query carries a full DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# Quasi-identifier definition shared by both privacy audits: segment ×
# nation × coarse balance bucket (1000-currency bins of exact cents).
_QI_SQL = """
      SELECT c_custkey,
             c_mktsegment AS seg,
             c_nationkey AS nat,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bal_bin
      FROM customer
"""


@query(
    "privacy_k_anonymity_audit",
    oracle=f"""
    WITH qi AS ({_QI_SQL}),
    classes AS (
      SELECT seg, nat, bal_bin, CAST(COUNT(*) AS BIGINT) AS sz
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS min_class_size,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt_2,
           CAST(SUM(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT) AS rows_lt_2,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt_5,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_lt_5,
           CAST(SUM(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt_10,
           CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT) AS rows_lt_10
    FROM classes
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY RISK AUDIT (Sweeney 2002) — the re-identification
    readout a governance review runs before releasing a table: group rows
    by their quasi-identifier combination (segment × nation × coarse
    balance bucket) and count equivalence classes — and rows — below the
    k ∈ {2, 5, 10} thresholds. A class of size 1 is a unique fingerprint;
    rows_lt_k is the population at re-identification risk if the release
    requires k-anonymity. Two map-side-combined aggregates (rows → classes
    → one summary row), all exact integers — the same plan shape at 100 TB
    with the QI rollup as the only shuffle."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        (F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint") / 100000)
        .cast("bigint")
        .alias("bal_bin"),
    )
    classes = qi.groupBy("seg", "nat", "bal_bin").agg(
        F.count("*").cast("bigint").alias("sz")
    )

    def below(k, what):
        cond = F.col("sz") < k
        if what == "classes":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
        return F.sum(F.when(cond, F.col("sz")).otherwise(0)).cast("bigint")

    return classes.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        below(2, "classes").alias("classes_lt_2"),
        below(2, "rows").alias("rows_lt_2"),
        below(5, "classes").alias("classes_lt_5"),
        below(5, "rows").alias("rows_lt_5"),
        below(10, "classes").alias("classes_lt_10"),
        below(10, "rows").alias("rows_lt_10"),
    )


@query(
    "privacy_l_diversity_audit",
    oracle=f"""
    WITH qi AS ({_QI_SQL}),
    joined AS (
      SELECT qi.seg, qi.nat, qi.bal_bin, o.o_orderpriority AS sensitive
      FROM qi JOIN orders o ON o.o_custkey = qi.c_custkey
    ),
    classes AS (
      SELECT seg, nat, bal_bin,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
      FROM joined GROUP BY 1, 2, 3
    )
    SELECT l AS distinct_sensitive,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(MIN(n_rows) AS BIGINT) AS min_class_rows,
           CAST(MAX(n_rows) AS BIGINT) AS max_class_rows
    FROM classes GROUP BY l
    """,
)
def privacy_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY AUDIT (Machanavajjhala et al. 2007) — k-anonymity's
    successor check: a class can be large yet still leak if every member
    shares the SAME sensitive value (the homogeneity attack). Per
    quasi-identifier class, count DISTINCT sensitive values (the order
    priority of the customer's orders) and report the class histogram by
    l — classes at l = 1 are fully disclosing regardless of size. One
    key-joined fact scan, a distinct-count rollup per class, and a
    bounded histogram (l ≤ 5 priorities); the join and both aggregates
    shuffle on the QI/customer keys exactly as they would at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    qi = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        (F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint") / 100000)
        .cast("bigint")
        .alias("bal_bin"),
    )
    joined = qi.join(o, qi["c_custkey"] == o["o_custkey"]).select(
        "seg", "nat", "bal_bin", F.col("o_orderpriority").alias("sensitive")
    )
    classes = joined.groupBy("seg", "nat", "bal_bin").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count_distinct("sensitive").cast("bigint").alias("l"),
    )
    return classes.groupBy(F.col("l").alias("distinct_sensitive")).agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("n_rows").cast("bigint").alias("min_class_rows"),
        F.max("n_rows").cast("bigint").alias("max_class_rows"),
    )


@query(
    "features_target_encoding_loo",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             o_orderpriority AS cat,
             CASE WHEN FLOOR(o_totalprice * 100 + 0.5) >= 15000000
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), stats AS (
      SELECT cat, CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY cat
    )
    SELECT b.o_orderkey, b.cat, CAST(b.y AS INT) AS y,
           ROUND(CAST(s - b.y AS DOUBLE) / NULLIF(n - 1, 0), 6) AS loo_enc,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS naive_enc
    FROM base b JOIN stats USING (cat)
    """,
)
def features_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING — the leakage-safe form of the
    classic high-cardinality categorical feature: each row's encoding is
    the category's label mean EXCLUDING ITSELF, (Σy − yᵢ)/(n − 1), so the
    feature never memorizes its own label (the naive Σy/n column is
    emitted beside it — their difference IS the leakage a CV pipeline
    would see). Label = high-value order flag on exact cents; one
    category aggregate broadcast back onto the fact rows — at 100 TB the
    category table is tiny and the fact scan is the only big pass. All
    integers until the two final rounded divisions; n = 1 degenerates to
    NULL via NULLIF rather than a divide-by-zero."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.when(
            F.floor(F.col("o_totalprice") * 100 + 0.5) >= 15000000, 1
        ).otherwise(0).alias("y"),
    )
    stats = base.groupBy("cat").agg(
        F.sum("y").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    return base.join(F.broadcast(stats), "cat").select(
        "o_orderkey",
        "cat",
        F.col("y").cast("int").alias("y"),
        F.round(
            (F.col("s") - F.col("y")).cast("double")
            / F.nullif(F.col("n") - 1, F.lit(0)),
            6,
        ).alias("loo_enc"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("naive_enc"),
    )


@query(
    "privacy_t_closeness_audit",
    oracle=f"""
    WITH qi AS ({_QI_SQL}),
    joined AS (
      SELECT qi.seg, qi.nat, qi.bal_bin, o.o_orderpriority AS sensitive
      FROM qi JOIN orders o ON o.o_custkey = qi.c_custkey
    ),
    gdist AS (
      SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS nv FROM joined GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(nv) AS BIGINT) AS n FROM gdist
    ),
    cls AS (
      SELECT seg, nat, bal_bin, CAST(COUNT(*) AS BIGINT) AS nc
      FROM joined GROUP BY 1, 2, 3
    ),
    cell AS (
      SELECT seg, nat, bal_bin, sensitive, CAST(COUNT(*) AS BIGINT) AS ncv
      FROM joined GROUP BY 1, 2, 3, 4
    ),
    dev AS (
      SELECT c.seg, c.nat, c.bal_bin, c.nc,
             CAST(SUM(ABS(CAST(t.n AS DECIMAL(38,0)) * COALESCE(x.ncv, 0)
                          - CAST(c.nc AS DECIMAL(38,0)) * g.nv))
                  AS DECIMAL(38,0)) AS s,
             CAST(MAX(t.n) AS BIGINT) AS n
      FROM cls c CROSS JOIN gdist g CROSS JOIN tot t
      LEFT JOIN cell x ON x.seg = c.seg AND x.nat = c.nat
                      AND x.bal_bin = c.bal_bin AND x.sensitive = g.sensitive
      GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           FLOOR(MAX(CAST(s AS DOUBLE) / (2.0 * nc * n)) * 1000000 + 0.5)
             / 1000000 AS max_t,
           CAST(SUM(CASE WHEN s * 5 > CAST(2 AS DECIMAL(38,0)) * nc * n
                         THEN 1 ELSE 0 END) AS BIGINT) AS classes_t_gt_020,
           CAST(SUM(CASE WHEN s * 10 > CAST(7 AS DECIMAL(38,0)) * nc * n
                         THEN 1 ELSE 0 END) AS BIGINT) AS classes_t_gt_035,
           CAST(SUM(CASE WHEN s > CAST(nc AS DECIMAL(38,0)) * n
                         THEN 1 ELSE 0 END) AS BIGINT) AS classes_t_gt_050
    FROM dev
    """,
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS AUDIT (Li, Li & Venkatasubramanian 2007) — the third
    member of the privacy trilogy after privacy_k_anonymity_audit and
    privacy_l_diversity_audit: a class can be large AND diverse yet still
    leak if its sensitive-value DISTRIBUTION deviates from the table's
    (the skewness attack l-diversity misses). Per quasi-identifier class,
    the total-variation distance t = 0.5 * sum_v |p_class(v) - p_glob(v)|
    between the class's order-priority distribution and the global one,
    reported as the max and the class counts above t in {{0.2, 0.35,
    0.5}}. Exactness: t = S / (2*nc*N) with S = sum_v |N*ncv - nc*Nv|, an
    exact integer kept in DECIMAL(38,0) (N*ncv passes 2^63 at the 100 TB
    row target - the dual-SF moment gate applies), so every threshold
    test is an exact integer comparison (e.g. t > 0.2 iff 5S > 2*nc*N)
    and only the reported max_t is a final quantized division. Shape:
    the sensitive domain is BOUNDED (5 priorities), so the class x value
    deviation grid is |classes| x 5 under a broadcast of the 5-row
    global distribution - two keyed aggregates plus bounded algebra, no
    corpus re-scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    qi = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        (F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint") / 100000)
        .cast("bigint")
        .alias("bal_bin"),
    )
    joined = qi.join(o, qi["c_custkey"] == o["o_custkey"]).select(
        "seg", "nat", "bal_bin", F.col("o_orderpriority").alias("sensitive")
    )
    # r14: glob, cls and cell each re-ran the customer ⋈ orders join (16
    # parquet scans). The cell table is the finest grain — materialize it
    # once and REGROUP for the global and class marginals (identical
    # exact integers, Σ over cells), so the corpus join runs once (§2.4).
    cell = joined.groupBy("seg", "nat", "bal_bin", "sensitive").agg(
        F.count("*").cast("bigint").alias("ncv")
    ).localCheckpoint(eager=False)
    glob = cell.groupBy("sensitive").agg(
        F.sum("ncv").cast("bigint").alias("nv")
    )
    tot = glob.agg(F.sum("nv").cast("bigint").alias("n"))
    cls = cell.groupBy("seg", "nat", "bal_bin").agg(
        F.sum("ncv").cast("bigint").alias("nc")
    )
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["seg", "nat", "bal_bin", "sensitive"], "left")
    )
    dev = grid.groupBy("seg", "nat", "bal_bin", "nc").agg(
        F.sum(
            F.abs(
                F.col("n").cast("decimal(38,0)") * F.coalesce(F.col("ncv"), F.lit(0))
                - F.col("nc").cast("decimal(38,0)") * F.col("nv")
            )
        )
        .cast("decimal(38,0)")
        .alias("s"),
        F.max("n").cast("bigint").alias("n"),
    )
    two = F.lit(2).cast("decimal(38,0)")
    seven = F.lit(7).cast("decimal(38,0)")
    return dev.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        (
            F.floor(
                F.max(F.col("s").cast("double") / (2.0 * F.col("nc") * F.col("n")))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("max_t"),
        F.sum(
            F.when(F.col("s") * 5 > two * F.col("nc") * F.col("n"), 1).otherwise(0)
        ).cast("bigint").alias("classes_t_gt_020"),
        F.sum(
            F.when(F.col("s") * 10 > seven * F.col("nc") * F.col("n"), 1).otherwise(0)
        ).cast("bigint").alias("classes_t_gt_035"),
        F.sum(
            F.when(
                F.col("s") > F.col("nc").cast("decimal(38,0)") * F.col("n"), 1
            ).otherwise(0)
        ).cast("bigint").alias("classes_t_gt_050"),
    )


@query(
    "privacy_generalization_ladder",
    oracle="""
    WITH q AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             CAST(FLOOR(c_acctbal) AS BIGINT) AS dollar
      FROM customer
    ),
    u AS (
      SELECT 0 AS lvl, nat, seg, dollar AS balb FROM q
      UNION ALL
      SELECT 1, nat, seg, CAST(FLOOR(dollar / 100.0) AS BIGINT) FROM q
      UNION ALL
      SELECT 2, nat, seg, 0 FROM q
      UNION ALL
      SELECT 3, -1, seg, 0 FROM q
    ),
    cls AS (
      SELECT lvl, nat, seg, balb, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(lvl AS BIGINT) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS k5_violating_classes,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           FLOOR(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
                 / SUM(n) * 1000000 + 0.5) / 1000000 AS risk_frac
    FROM cls GROUP BY lvl
    """,
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERALIZATION LADDER — the step the k-anonymity audit
    (privacy_k_anonymity_audit) feeds: walk the quasi-identifier lattice
    from raw (nation, segment, exact-dollar balance) through
    progressively coarser cells ($100 balance bands -> drop balance ->
    drop nation) and report, per level, the equivalence-class count, the
    smallest class, and how many classes/rows still violate k = 5 — the
    table a Samarati/Incognito-style anonymizer reads to pick the
    MINIMAL generalization that reaches k, i.e. the least information
    destroyed for the required protection. All exact integers (class
    sizes) except the final rounded at-risk row fraction; one union of
    four projections over one customer scan + one map-side-combinable
    groupBy, so the whole lattice walk costs a single shuffle at any
    corpus size. Balance banding floors on DOLLARS (bounded domain,
    engine-identical FLOOR on exact integer/100.0 doubles), never on
    float cents."""
    c = load_table(spark, sf_dir, "customer")
    q = c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal")).cast("bigint").alias("dollar"),
    )
    levels = [
        q.select(F.lit(0).alias("lvl"), "nat", "seg",
                 F.col("dollar").alias("balb")),
        q.select(F.lit(1).alias("lvl"), "nat", "seg",
                 F.floor(F.col("dollar") / 100.0).cast("bigint").alias("balb")),
        q.select(F.lit(2).alias("lvl"), "nat", "seg",
                 F.lit(0).cast("bigint").alias("balb")),
        q.select(F.lit(3).alias("lvl"), F.lit(-1).alias("nat"), "seg",
                 F.lit(0).cast("bigint").alias("balb")),
    ]
    u = levels[0]
    for lv in levels[1:]:
        u = u.unionByName(lv)
    cls = u.groupBy("lvl", "nat", "seg", "balb").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return cls.groupBy(F.col("lvl").cast("bigint").alias("lvl")).agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("n").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("bigint")
        .alias("k5_violating_classes"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).cast("bigint")
        .alias("rows_at_risk"),
        (
            F.floor(
                F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
                .cast("double")
                / F.sum("n")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("risk_frac"),
    )
