#!/usr/bin/env python
"""Dump explain('formatted') + noop-sink steady timing + job count for a
list of registered queries — the generic before/after capture used for
the r14 plan evidence under plans/r14/.

Usage: python tools/capture_plans.py before|after q1 q2 ... [--sf=sf_dir] [--n=3]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.staging import stage_inputs  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    assert mode in ("before", "after"), mode
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    n_timed = 3
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--n="):
            n_timed = int(a.split("=", 1)[1])

    out_dir = os.path.join(REPO_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    target = os.path.join(
        REPO_ROOT, "_scratch", "bench_staged", os.path.basename(sf_dir.rstrip("/"))
    )
    data_dir = stage_inputs(spark, sf_dir, target)
    tracker = spark.sparkContext.statusTracker()

    qs = all_queries()
    for name in names:
        df = qs[name].builder(spark, data_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{mode}.txt"), "w") as f:
            f.write(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()  # warm
        group = f"{name}-{mode}"
        spark.sparkContext.setJobGroup(group, group)
        best = float("inf")
        for _ in range(n_timed):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        job_ids = tracker.getJobIdsForGroup(group) or []
        n_jobs = len(job_ids) // n_timed
        n_stages = 0
        for jid in sorted(job_ids)[:n_jobs]:
            info = tracker.getJobInfo(jid)
            if info:
                n_stages += len(info.stageIds)
        spark.sparkContext.setJobGroup(None, None)
        print(f"{name:34s} jobs={n_jobs} stages={n_stages} steady={best:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
