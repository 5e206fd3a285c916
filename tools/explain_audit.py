import sys, io, contextlib
sys.path.insert(0, "/root/repo")
from sql_redshift_etl_spark.session import get_spark
from sql_redshift_etl_spark.plans.registry import all_queries
spark = get_spark("explain-audit")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
targets = ["flagship_pricing_summary", "scan_project_expr", "join_star_revenue",
           "events_tumbling_daily", "window_topk_per_group", "sim_knn_bruteforce",
           "text_doc_stats_by_lang"]
out = {}
for name in targets:
    df = qs[name].builder(spark, "/root/testdata/sf0.1")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out[name] = buf.getvalue()
with open("/root/repo/_scratch/plans.txt", "w") as f:
    for name, plan in out.items():
        f.write(f"===== {name} =====\n{plan}\n")
# quick checks
for name, plan in out.items():
    checks = {
        "pushed": "PushedFilters: [" in plan and not all("PushedFilters: []" in seg for seg in plan.split("Scan parquet")[1:]),
        "codegen": "WholeStageCodegen" in plan,
        "broadcast": "BroadcastHashJoin" in plan,
        "takeordered": "TakeOrderedAndProject" in plan,
        "windowlimit": "WindowGroupLimit" in plan,
    }
    print(name, checks)
spark.stop()
