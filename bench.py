#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is via the noop datasource (full execution, no driver
collect), so timings measure the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from sql_redshift_etl_spark.plans.registry import all_queries
    from sql_redshift_etl_spark.session import get_spark

    spark = get_spark("sql-redshift-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # Methodology (mirrors tools/duckdb_baseline.py, which times DuckDB
    # warm): run each query twice — run 1 = cold (plan + codegen compile +
    # first file read), run 2 = steady-state engine throughput. Headline
    # value is steady-state total; cold timings are reported alongside.
    bench_queries = {n: q for n, q in all_queries().items() if q.bench}
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        df = q.builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_steady",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
