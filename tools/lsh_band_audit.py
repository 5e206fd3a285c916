#!/usr/bin/env python
"""Measure the LSH band-bucket size distribution (VERDICT r3 "what's
wrong" #4: a boilerplate-heavy corpus makes one band bucket hot and the
candidate set quadratic WITHIN that bucket — the one real scale hazard
left in the dedup path).

For each sf dir: bucket sizes over (band_idx, band_val), the top
buckets, and the candidate-pair mass sum(n*(n-1)/2) decomposed by bucket
size, so the docs/SCALE.md design can quote measured numbers for where a
cap would bite.

Usage: python tools/lsh_band_audit.py [sf_dir ...] [--cap=N]
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm.dedup import lsh_band_buckets  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def audit(spark, sf_dir: str, cap: int) -> dict:
    buckets = lsh_band_buckets(load_table(spark, sf_dir, "documents"))
    sizes = buckets.groupBy("band_idx", "band_val").agg(F.count(F.lit(1)).alias("n"))
    pairs = F.col("n") * (F.col("n") - 1) / 2
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_size"),
        F.expr("percentile(n, 0.99)").alias("p99_size"),
        F.sum(pairs).alias("pair_mass_total"),
        F.sum(F.when(F.col("n") > cap, pairs).otherwise(F.lit(0))).alias("pair_mass_over_cap"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("buckets_over_cap"),
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias("docs_in_over_cap"),
    ).collect()[0]
    top = [
        {"band_idx": r["band_idx"], "n": r["n"]}
        for r in sizes.orderBy(F.col("n").desc()).limit(5).collect()
    ]
    out = {"sf_dir": sf_dir, "cap": cap, **{k: (float(v) if v is not None else None) for k, v in stats.asDict().items()}}
    out["top_buckets"] = top
    return out


def main() -> None:
    cap = 1000
    dirs = []
    for a in sys.argv[1:]:
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])
        else:
            dirs.append(a)
    dirs = dirs or [
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "_scratch", "sf10"),
    ]
    spark = get_spark("lsh-band-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}", file=sys.stderr)
            continue
        print(json.dumps(audit(spark, d, cap)))
    spark.stop()


if __name__ == "__main__":
    main()
