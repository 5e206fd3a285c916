#!/usr/bin/env python
"""A/B: AQE on vs off for the bench set at interactive scale.

Hypothesis (BASELINE.md job-floor decomposition): at sf0.1 the bench
total is dominated by per-job orchestration, and AQE *materializes every
exchange as a job boundary* — so runtime re-planning, the single most
important knob at 100 TB, may be a net TAX at toy scale where nothing it
re-plans (coalescing, skew splits, runtime broadcasts) can pay for the
extra job launches. This tool measures that directly: same session, same
staged layout, each bench query best-of-5 with
spark.sql.adaptive.enabled toggled at runtime (it is a runtime-settable
SQL conf; plans recompile per setting because the builder is re-invoked).

Order alternates B/A per query to keep JIT/cache drift symmetric.

Usage: python tools/aqe_floor_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.staging import stage_inputs  # noqa: E402


def _best_of(df, runs: int = 5) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("aqe-floor-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    target = os.path.join(
        REPO_ROOT, "_scratch", "bench_staged", os.path.basename(sf_dir.rstrip("/"))
    )
    data_dir = stage_inputs(spark, sf_dir, target)

    bench = {n: q for n, q in all_queries().items() if q.bench}
    on: dict[str, float] = {}
    off: dict[str, float] = {}
    for i, (name, q) in enumerate(sorted(bench.items())):
        for setting in ("true", "false") if i % 2 == 0 else ("false", "true"):
            spark.conf.set("spark.sql.adaptive.enabled", setting)
            df = q.builder(spark, data_dir)
            df.write.format("noop").mode("overwrite").save()  # warm/compile
            t = _best_of(df)
            (on if setting == "true" else off)[name] = round(t, 4)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            f"{name:34s} aqe_on={on[name]:7.3f}  aqe_off={off[name]:7.3f}  "
            f"ratio={on[name] / off[name]:5.2f}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "aqe_on_total": round(sum(on.values()), 4),
                "aqe_off_total": round(sum(off.values()), 4),
                "on": on,
                "off": off,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
