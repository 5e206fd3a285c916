#!/usr/bin/env python
"""A/B: incremental MinHash ingest vs from-scratch dedup (r6).

The production claim behind llm/dedup.py's incremental path is that a
standing corpus persists its signature relation once, and each ingest
pays only sign(delta) + band-probe — NOT a full re-sign + self-join.
This tool measures exactly that split on a scaled documents tier:

  one-time : write _minhash_signatures(corpus) to parquet (the store)
  A (full) : minhash_lsh_pairs_df(all docs)            — from scratch
  B (incr) : read store, sign delta (10% of docs), band-join + verify

Both sides run to a noop sink, warm best-of-N. Pair-set equality of the
two paths (restricted to delta-involved pairs) is asserted separately
by pytest (test_dedup_incremental_matches_full_restricted) and the
driver oracle; this tool measures WALL only.

Usage: python tools/incremental_ingest_ab.py [sf_dir] [--runs=N]
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
    _minhash_signatures,
    minhash_incremental_pairs_from_sigs,
    minhash_lsh_pairs_df,
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


def main() -> None:
    runs = 2
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    d = dirs[0] if dirs else os.path.join(REPO_ROOT, "_scratch", "sf30")
    store = os.path.join(REPO_ROOT, "_scratch", "io", "minhash_store")
    spark = get_spark("incremental-ingest-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    t0 = time.perf_counter()
    _minhash_signatures(corpus).write.mode("overwrite").parquet(store)
    t_store = time.perf_counter() - t0

    full_wall = _timed(minhash_lsh_pairs_df(docs), runs)
    incr = minhash_incremental_pairs_from_sigs(
        spark.read.parquet(store), _minhash_signatures(delta)
    )
    incr_wall = _timed(incr, runs)
    print(
        json.dumps(
            {
                "sf_dir": d,
                "n_docs": docs.count(),
                "store_build_s": round(t_store, 2),
                "full_from_scratch_s": round(full_wall, 2),
                "incremental_ingest_s": round(incr_wall, 2),
                "ingest_over_full": round(incr_wall / full_wall, 3),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
