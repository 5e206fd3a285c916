"""Simulates the verify driver: vanilla SparkSession (NOT the package's tuned
factory), import __spark_entry__, smoke entry(), run every queries()[name] at
sf0.01 vs oracle_sql()[name] in DuckDB, order-insensitive compare."""
import sys, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

# deliberately vanilla: no nanosAsLong, no UTC tz, default shuffle partitions
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("ENTRY_OK rows=", len(rows), "cols=", df.columns)

qs, osql = e.queries(), e.oracle_sql()
print("n_queries=", len(qs), "n_oracles=", len(osql))

from sql_redshift_etl_spark.oracle import register_duckdb_views, compare_frames
con = duckdb.connect()
register_duckdb_views(con, "/root/testdata/sf0.01")

fails = []
for name, fn in sorted(qs.items()):
    try:
        sdf = fn(spark, "/root/testdata/sf0.01").toPandas()
        if name in osql:
            rep = compare_frames(sdf, con.execute(osql[name]).df())
            ok = rep["columns_match"] and rep["rowcount_match"] and rep["values_match"]
            print(("OK  " if ok else "FAIL"), name, rep["spark_rows"], "rows")
            if not ok:
                fails.append((name, {k: v for k, v in rep.items() if k != "first_diffs"}, rep.get("first_diffs")))
        else:
            print("ROWS", name, len(sdf), "rows (no oracle)")
    except Exception as ex:  # the real driver isolates per-query errors too
        print("ERR ", name, str(ex).splitlines()[0][:160])
        fails.append((name, "exception", str(ex).splitlines()[0][:300]))
# probe: entry twice (driver may re-call); registry stability
df2 = e.entry(spark)
assert len(df2.collect()) == len(rows), "entry() not idempotent"
print("ENTRY_IDEMPOTENT_OK")
print("FAILURES:", json.dumps(fails, default=str) if fails else "none")
spark.stop()
