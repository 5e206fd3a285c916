#!/usr/bin/env python
"""Composed end-to-end corpus pipeline at a scale tier (VERDICT r5 item
4): every *component* already has scale numbers (dedup_scale_trend), but
the composed ``etl_training_corpus_pipeline`` plan is where stage-boundary
surprises (a lost ReusedExchange, double signing of the minhash stage)
would hide. One measured row: wall (noop-sink, warm best-of-N), shuffle
exchange count and total shuffle bytes from the Spark listener, plus the
ledger itself (per-source counts prove the run did real work).

Usage: python tools/pipeline_scale.py [sf_dir ...] [--runs=N]
Defaults to the documents-only sf30 tier (_scratch/sf30).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.llm.pipeline_e2e import (  # noqa: E402
    etl_training_corpus_pipeline,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = 2
    dirs: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            dirs.append(a)
    dirs = dirs or [os.path.join(REPO_ROOT, "_scratch", "sf30")]
    spark = get_spark("pipeline-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}", file=sys.stderr)
            continue
        df = etl_training_corpus_pipeline(spark, d)
        # formatted explain lists each physical operator exactly once —
        # a raw toString() reprints reused subtrees and overcounts
        import re as _re

        fmt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        exchanges = len(_re.findall(r"\(\d+\) Exchange", fmt))
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        ledger = [r.asDict() for r in df.collect()]
        print(
            json.dumps(
                {
                    "sf_dir": d,
                    "wall_best_s": round(best, 2),
                    "plan_exchanges": exchanges,
                    "ledger": ledger,
                },
                default=str,
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
