#!/usr/bin/env python
"""A/B: incremental-span stored-keys probe — plain parquet vs BUCKETED
(r9 — verdict r8 item 5).

substring_spans_incremental_df's docstring claims the 100 TB form
buckets the materialized stored-key relation on ``key`` so the delta
probe co-locates (the DISTKEY argument). This tool measures that claim
instead of asserting it: the corpus' distinct hashed window keys are
written (a) as plain parquet and (b) as a bucketBy(key)+sortBy(key)
saved table, then the SAME delta ingest plan runs against both stores.
Reported per store: wall (warm best-of-N) and the number of live
hashpartitioning exchanges in the physical plan (the co-location claim
is precisely "one fewer Exchange on the probe side").

Usage: python tools/span_bucketed_probe_ab.py [sf_dir ...] [--runs=N]
       [--buckets=B]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    SUBSTR_K,
    _substr_wins,
    substring_spans_incremental_df,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def _timed(df, runs: int) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _live_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    )


def main() -> None:
    runs, buckets = 2, 32
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--buckets="):
            buckets = int(a.split("=", 1)[1])
    if not dirs:
        dirs = [os.path.join(REPO_ROOT, "_scratch", "sf10")]
    spark = get_spark("span-bucketed-probe-ab")
    spark.sparkContext.setLogLevel("ERROR")
    plain_store = os.path.join(REPO_ROOT, "_scratch", "io", "span_keys_plain")
    for d in dirs:
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        corpus = docs.where(F.col("doc_id") % 10 != 0)
        delta = docs.where(F.col("doc_id") % 10 == 0)
        keys = _substr_wins(corpus, SUBSTR_K, True).select("key").distinct()

        t0 = time.perf_counter()
        keys.write.mode("overwrite").parquet(plain_store)
        t_plain_store = time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            keys.write.mode("overwrite")
            .bucketBy(buckets, "key")
            .sortBy("key")
            .saveAsTable("span_keys_bucketed")
        )
        t_bucketed_store = time.perf_counter() - t0

        plain = substring_spans_incremental_df(
            None, delta, hashed=True, stored_keys=spark.read.parquet(plain_store)
        )
        bucketed = substring_spans_incremental_df(
            None,
            delta,
            hashed=True,
            stored_keys=spark.table("span_keys_bucketed"),
        )
        out = {
            "sf_dir": d,
            "n_docs": docs.count(),
            "buckets": buckets,
            "store_build_plain_s": round(t_plain_store, 2),
            "store_build_bucketed_s": round(t_bucketed_store, 2),
            "plain_exchanges": _live_exchanges(plain),
            "bucketed_exchanges": _live_exchanges(bucketed),
            "plain_probe_s": round(_timed(plain, runs), 2),
            "bucketed_probe_s": round(_timed(bucketed, runs), 2),
        }
        out["bucketed_over_plain"] = round(
            out["bucketed_probe_s"] / out["plain_probe_s"], 3
        )
        print(json.dumps(out), flush=True)
    spark.sql("DROP TABLE IF EXISTS span_keys_bucketed")
    spark.stop()


if __name__ == "__main__":
    main()
