#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged queries from the registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is via the noop datasource (full execution, no driver
collect), so timings measure the engine, not result transfer.

Layout staging: the fixture tables are single-file single-row-group
parquet, which serializes every scan to one task regardless of engine
parallelism (BASELINE.md). At startup the input is staged ONCE into
multi-file parquet under _scratch/bench_staged (time reported separately
as "stage_secs", never counted in query timings), and each query is timed
on BOTH layouts. The headline value is the staged steady-state total —
compare it against the DuckDB baseline measured on the SAME staged
directory (tools/duckdb_baseline.py, BASELINE.md) so both engines read
identical bytes. Set SPARK_GRAFT_STAGE=0 to benchmark the raw layout only.
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
    from sql_redshift_etl_spark.staging import stage_inputs

    spark = get_spark("sql-redshift-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    staged_dir: str | None = None
    stage_secs = 0.0
    if os.environ.get("SPARK_GRAFT_STAGE", "1") != "0":
        target = os.path.join(
            REPO_ROOT, "_scratch", "bench_staged", os.path.basename(sf_dir.rstrip("/"))
        )
        try:
            t0 = time.perf_counter()
            staged_dir = stage_inputs(spark, sf_dir, target)
            stage_secs = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # read-only workspace etc. — bench raw layout
            print(f"staging skipped: {exc}", file=sys.stderr)
            staged_dir = None

    # Methodology (mirrors tools/duckdb_baseline.py and tools/
    # scale_trend.py, which time engines warm): run 1 = cold (plan +
    # codegen compile + first file read); steady = BEST of 5 warm runs —
    # single warm runs on sub-second queries carry ±0.1 s of JVM/GC/JIT
    # noise, a large fraction of the total, and best-of-n is the standard
    # noise-floor estimator; the DuckDB baseline uses the same best-of-5.
    # Headline value is the steady total on the staged layout; raw-layout
    # steady timings are reported alongside for transparency.
    bench_queries = {n: q for n, q in all_queries().items() if q.bench}

    def run_all(data_dir: str, steady_runs: int = 5) -> tuple[dict[str, float], dict[str, float]]:
        steady: dict[str, float] = {}
        cold: dict[str, float] = {}
        for name, q in sorted(bench_queries.items()):
            df = q.builder(spark, data_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 4)
            best = float("inf")
            for _ in range(steady_runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            steady[name] = round(best, 4)
        return steady, cold

    raw_steady, raw_cold = run_all(sf_dir)
    if staged_dir is not None:
        timings, cold = run_all(staged_dir)
    else:
        timings, cold = raw_steady, raw_cold

    # Same-run DuckDB denominator (VERDICT r3): the 2× bar is a ratio vs
    # DuckDB on the SAME layout measured in the SAME run — emit it in the
    # JSON so the headline ratio is self-contained and audit-proof.
    # Spark is idle while DuckDB runs (sequential, same process), so the
    # two timings don't contend.
    duck_queries: dict[str, float] = {}
    try:
        from tools.duckdb_baseline import measure_queries

        duck_queries = measure_queries(staged_dir if staged_dir is not None else sf_dir)
    except Exception as exc:
        print(f"duckdb baseline skipped: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    duck_total = round(sum(duck_queries.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_steady",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 4),
                "staged": staged_dir is not None,
                "stage_secs": stage_secs,
                "raw_layout_queries": raw_steady,
                "raw_layout_total": round(sum(raw_steady.values()), 4),
                "duck_queries": duck_queries,
                "duck_total": duck_total,
                "ratio_vs_duckdb": round(total / duck_total, 2) if duck_total else None,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
