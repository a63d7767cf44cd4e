"""Simulate the grading driver: import __spark_entry__, smoke entry(), run each
queries() entry vs its oracle_sql() on DuckDB at sf0.01, print verdict lines."""
import math, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_CPUS"] = "8"
import duckdb
import __spark_entry__ as m
from kafka_es_spark.session import get_spark

spark = get_spark("driver-sim", shuffle_partitions=8)
t0 = time.time()
df = m.entry(spark)
rows = df.collect()
print(f"ENTRY ok rows={len(rows)} schema={df.schema.simpleString()} sample={rows[:3]} t={time.time()-t0:.1f}s")

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None:
        # distinct sentinel: a SQL NULL must NOT normalize equal to '' (an
        # engine emitting '' where the oracle emits NULL is a real bug)
        return ("\x00null",)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 4)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def key(row):
    return tuple(str(type(v).__name__) + ":" + str(v) for v in row)

qs, osql = m.queries(), m.oracle_sql()
for name, fn in qs.items():
    t0 = time.time()
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in osql:
        print(f"{name}: ROWS-ONLY rows={len(srows)} t={time.time()-t0:.1f}s")
        continue
    res = con.sql(osql[name]); dcols = [d[0] for d in res.description]; drows = res.fetchall()
    cols_ok = sorted(sdf.columns) == sorted(dcols)
    idx_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    gs = sorted((tuple(norm(r[i]) for i in idx_s) for r in srows), key=key)
    gd = sorted((tuple(norm(r[i]) for i in idx_d) for r in drows), key=key)
    print(f"{name}: cols={'OK' if cols_ok else 'MISMATCH'} rows={len(srows)}/{len(drows)} values={'OK' if gs==gd else 'MISMATCH'} t={time.time()-t0:.1f}s")
    if gs != gd:
        bad = [(a,b) for a,b in zip(gs,gd) if a!=b][:3]
        print("   first diffs:", bad)
spark.stop()
