"""Row-level fingerprint diff: localize an agg_table_fingerprint divergence.

agg_table_fingerprint combines EVERY orders row into one commutative
SUM/XOR, so a single divergent row anywhere flips the table hash with no
signal about WHICH row. This harness recomputes the per-row canonical
fingerprint on BOTH engines, joins them on o_orderkey, and prints the
first N differing rows with each engine's canonical string and 48-bit fp
side by side — turning "hash_match: false" into a named row and column.

Usage: python tools/fingerprint_diff.py [SF_DIR] [N]
Exit 0 = identical per-row fingerprints; 1 = diffs printed.
"""
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# Canonical forms pinned to plans/relational6.py::agg_table_fingerprint —
# keep in lockstep with the graded query (and its oracle SQL) or the diff
# harness will report false divergence.
DUCK_SQL = f"""
SELECT o_orderkey,
       concat_ws('|',
         CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
         o_orderstatus,
         CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
         strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority) AS canon,
       CAST(('0x' || substr(md5(concat_ws('|',
         CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
         o_orderstatus,
         CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
         strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)), 1, 12))
       AS BIGINT) AS fp
FROM read_parquet('{SF}/orders.parquet')
"""

spark = (
    SparkSession.builder.master("local[16]")
    .appName("fingerprint-diff")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
canon = F.concat_ws(
    "|",
    F.col("o_orderkey").cast("string"),
    F.col("o_custkey").cast("string"),
    F.col("o_orderstatus"),
    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").cast("string"),
    F.date_format("o_orderdate", "yyyy-MM-dd"),
    F.col("o_orderpriority"),
)
sdf = (
    spark.read.parquet(f"{SF}/orders.parquet")
    .select(
        "o_orderkey",
        canon.alias("canon"),
        F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint").alias("fp"),
    )
)
spark_rows = {r.o_orderkey: (r.canon, r.fp) for r in sdf.collect()}
duck_rows = {k: (c, fp) for k, c, fp in duckdb.connect().execute(DUCK_SQL).fetchall()}

diffs = []
for k in sorted(set(spark_rows) | set(duck_rows)):
    s, d = spark_rows.get(k), duck_rows.get(k)
    if s != d:
        diffs.append((k, s, d))
        if len(diffs) >= N:
            break

for k, s, d in diffs:
    print(f"DIFF o_orderkey={k}")
    print(f"  spark: canon={s[0] if s else None!r} fp={s[1] if s else None}")
    print(f"  duck : canon={d[0] if d else None!r} fp={d[1] if d else None}")
print(f"RESULT: {len(diffs)} differing rows shown (of {len(spark_rows)} spark / "
      f"{len(duck_rows)} duck)")
spark.stop()
sys.exit(1 if diffs else 0)
