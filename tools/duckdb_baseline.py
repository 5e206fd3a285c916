#!/usr/bin/env python
"""Measure the DuckDB working baseline (BASELINE.md): wall-clock per
oracle SQL of every bench-tagged query at a given sf dir.

The unreachable reference repo has no recoverable numbers (SURVEY.md §0),
so DuckDB-on-this-machine is the single-node engine we benchmark against:
bench.py (Spark) should stay within ~2× of these numbers at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.oracle import register_duckdb_views  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402


def measure_queries(sf_dir: str, steady_runs: int = 5) -> dict[str, float]:
    """Best-of-n warm DuckDB timing per bench-tagged oracle — the same
    estimator bench.py uses for Spark, so the ratio is apples-to-apples.
    Also imported by bench.py so BENCH_r{N}.json carries its own
    same-run denominator (VERDICT r3 "what's wrong" #2)."""
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    timings: dict[str, float] = {}
    for name, q in sorted(all_queries().items()):
        if not q.bench or q.oracle is None:
            continue
        con.execute(q.oracle).fetchall()  # warm file cache
        best = float("inf")
        for _ in range(steady_runs):  # best-of-5 steady — same estimator as bench.py
            t0 = time.perf_counter()
            con.execute(q.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    con.close()
    return timings


def measure(sf_dir: str) -> None:
    timings = measure_queries(sf_dir)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir, "queries": timings, "total": round(sum(timings.values()), 4)}))


def main() -> None:
    # argv dirs win; default = the raw fixture dir AND the bench-staged copy
    # (if present), so BASELINE.md can compare both engines on both layouts.
    dirs = sys.argv[1:]
    if not dirs:
        raw = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        dirs = [raw]
        staged = os.path.join(
            REPO_ROOT, "_scratch", "bench_staged", os.path.basename(raw.rstrip("/"))
        )
        if os.path.isdir(staged):
            dirs.append(staged)
    for d in dirs:
        measure(d)


if __name__ == "__main__":
    main()
