import sys
sys.path.insert(0, "/root/repo")
from sql_redshift_etl_spark.session import get_spark
from sql_redshift_etl_spark.plans.registry import all_queries
from sql_redshift_etl_spark.oracle import register_duckdb_views
import duckdb
spark = get_spark("dtype-audit", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect(); register_duckdb_views(con, "/root/testdata/sf0.001")
bad = []
for name, q in sorted(all_queries().items()):
    if q.oracle is None: continue
    try:
        s = q.builder(spark, "/root/testdata/sf0.001").toPandas()
        d = con.execute(q.oracle).df()
        for c in sorted(s.columns):
            st, dt = str(s[c].dtype), str(d[c].dtype)
            if st != dt:
                bad.append((name, c, st, dt))
    except Exception as e:
        bad.append((name, "<error>", str(e)[:80], ""))
for b in bad: print(b)
print("total mismatches:", len(bad))
spark.stop()
