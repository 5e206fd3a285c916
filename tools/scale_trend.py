#!/usr/bin/env python
"""Spark-vs-DuckDB ratio trend across scale factors (BASELINE.md §trend).

Runs every bench-tagged query on both engines at each given sf dir and
prints per-sf totals + ratios. The claim under test: the sf0.1 gap is
fixed cost, not plan cost — so the ratio must FALL as data grows. Usage:

    python tools/scale_trend.py /root/testdata/sf0.01 /root/testdata/sf0.1 _scratch/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402

from sql_redshift_etl_spark.oracle import register_duckdb_views  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def time_spark(spark, builder, sf_dir: str, runs: int = 3) -> float:
    df = builder(spark, sf_dir)
    best = float("inf")
    df.write.format("noop").mode("overwrite").save()  # cold/compile run
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def time_duck(con, sql: str, runs: int = 3) -> float:
    con.execute(sql).fetchall()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "_scratch", "sf1"),
    ]
    bench = {n: q for n, q in all_queries().items() if q.bench and q.oracle}
    spark = get_spark("scale-trend")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = []
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        register_duckdb_views(con, sf_dir)
        row = {"sf_dir": sf_dir, "queries": {}}
        for name, q in sorted(bench.items()):
            s = time_spark(spark, q.builder, sf_dir)
            d = time_duck(con, q.oracle)
            row["queries"][name] = {
                "spark": round(s, 3),
                "duckdb": round(d, 3),
                "ratio": round(s / d, 2),
            }
        row["spark_total"] = round(sum(v["spark"] for v in row["queries"].values()), 3)
        row["duckdb_total"] = round(sum(v["duckdb"] for v in row["queries"].values()), 3)
        row["ratio_total"] = round(row["spark_total"] / row["duckdb_total"], 2)
        results.append(row)
        con.close()
        print(json.dumps(row))
    spark.stop()

    # markdown trend table to stderr-free stdout for BASELINE.md
    names = sorted(bench)
    print("\n| query | " + " | ".join(os.path.basename(r["sf_dir"]) for r in results) + " |")
    print("|---|" + "---|" * len(results))
    for n in names:
        cells = [
            f"{r['queries'][n]['spark']:.2f}s / {r['queries'][n]['duckdb']:.2f}s = {r['queries'][n]['ratio']}×"
            for r in results
        ]
        print(f"| {n} | " + " | ".join(cells) + " |")
    print(
        "| **total** | "
        + " | ".join(
            f"**{r['spark_total']:.2f}s / {r['duckdb_total']:.2f}s = {r['ratio_total']}×**"
            for r in results
        )
        + " |"
    )


if __name__ == "__main__":
    main()
