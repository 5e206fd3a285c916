#!/usr/bin/env python
"""Executed-plan census over EVERY registered query (r13 optimization
round): run each query once at sf0.01 (the driver's correctness tier),
then count structural plan features in the AQE FINAL plan — FileScans,
distinct shuffle stages, broadcast stages, Generates, Python-boundary
nodes, range partitionings. Purpose: surface structural waste the
per-query audits can miss (duplicate subtrees that ReuseExchange does
not unify — the way text_tfidf_top_terms' double corpus explode was
found — unpushed filters materializing as extra scans, accidental
Python nodes, range-sort sampling on tiny outputs).

Usage: python tools/query_plan_census.py [sf_dir] [out.json]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def census_of(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    s = buf.getvalue()
    # Post-execution, AQE prints "== Final Plan ==" then "== Initial
    # Plan ==": keep only the final section so reused stages are not
    # double-counted.
    final = s.split("== Initial Plan ==")[0]
    return {
        "file_scans": len(re.findall(r"FileScan \w+", final)),
        # Fallback for non-AQE plans counts ANY Exchange node (ADVICE r13:
        # the old hash/range-only pair missed SinglePartition and
        # rebalance exchanges).
        "shuffle_stages": len(set(re.findall(r"ShuffleQueryStage (\d+)", final)))
        or len(re.findall(r"(?m)^[\s+*:-]*Exchange ", final)),
        "broadcast_stages": len(set(re.findall(r"BroadcastQueryStage (\d+)", final))),
        "generates": final.count("Generate "),
        "python_nodes": sum(
            final.count(m)
            for m in ("EvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas")
        ),
        "range_partitionings": final.count("rangepartitioning"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/query_plan_census.json"
    spark = get_spark("query-plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    # ADVICE r13: without a warmup the first few queries carry JVM/codegen
    # startup in wall_cold_s; timings remain cold-ordered (each query's
    # first execution) and are comparable only within that caveat.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for name, q in sorted(all_queries().items()):
        try:
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            n_rows = len(df.collect())
            wall = round(time.perf_counter() - t0, 2)
            out[name] = {"rows": n_rows, "wall_cold_s": wall, **census_of(df)}
        except Exception as exc:  # a census must record, not die
            out[name] = {"err": str(exc)[:200]}
        print(name, out[name], flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    n_err = sum(1 for v in out.values() if "err" in v)
    print(f"census: {len(out)} queries, {n_err} errors -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
