"""Replica of the driver harness: entry smoke + per-query DuckDB oracle compare.

Usage: python tools/driver_sim.py [SF_DIR] [query_name ...]
Extra args restrict the sweep to the named queries (targeted re-check
after touching one plan); no names = all registered queries."""
import datetime, math, os, sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
spark = (SparkSession.builder.master("local[16]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())

df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.schema.simpleString()[:80]}")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None: return "N"
    if isinstance(v, float): return "nan" if math.isnan(v) else f"{v:.12g}"
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    return repr(v)

qs, os_ = E.queries(), E.oracle_sql()
ok = bad = 0
unknown = ONLY - set(qs)
if unknown:
    sys.exit(f"unknown queries: {sorted(unknown)}")
for name, fn in sorted(qs.items()):
    if ONLY and name not in ONLY:
        continue
    sdf = fn(spark, SF)
    srows, scols = sdf.collect(), sdf.columns
    if name not in os_:
        print(f"ROWSONLY {name}: {len(srows)} rows"); continue
    res = con.execute(os_[name]); dcols = [d[0] for d in res.description]; drows = res.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i]); do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted(tuple(canon(r[i]) for i in so) for r in srows)
    dset = sorted(tuple(canon(r[i]) for i in do) for r in drows)
    match = sorted(scols) == sorted(dcols) and sset == dset
    ok += match; bad += not match
    print(f"{'MATCH' if match else 'MISMATCH'} {name}: spark={len(srows)} oracle={len(drows)}")
print(f"RESULT: {ok} match, {bad} mismatch")
spark.stop()
