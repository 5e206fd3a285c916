#!/usr/bin/env python
"""A/B: brute-force vs banded sign-LSH embedding near-dup across scale.

dedup_embedding_cosine is the documented O(n²) correctness baseline;
dedup_embedding_ann is its scale path (BASELINE.md / docs/SCALE.md).
This tool measures the crossover on identical inputs: wall time for both
variants (noop sink, best-of-3 warm) plus the candidate-pair count vs
the all-pairs space at each tier — the quadratic-vs-banded growth the
docstrings claim, as numbers.

Usage: python tools/ann_dedup_ab.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 and _scratch/sf1 (20k vectors).
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm import dedup  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def _best_of(df, runs: int = 3) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm/compile
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "_scratch", "sf1"),
    ]
    spark = get_spark("ann-dedup-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qs = all_queries()
    print(f"{'tier':24s} {'n_vec':>7s} {'brute_s':>8s} {'ann_s':>8s} {'speedup':>7s} "
          f"{'cands':>10s} {'all_pairs':>12s} {'cand%':>6s} {'pairs=':>6s}")
    for d in dirs:
        e = load_table(spark, d, "embeddings")
        n = e.count()
        # Brute force is the thing being replaced BECAUSE it is quadratic:
        # 2M pairs (n=2k) already costs ~72 s, so above ~5k vectors we
        # report the baseline as infeasible rather than measure hours.
        brute = (
            _best_of(qs["dedup_embedding_cosine"].builder(spark, d)) if n <= 5000 else None
        )
        ann = _best_of(qs["dedup_embedding_ann"].builder(spark, d))
        # candidate mass: the band self-join output before the verify —
        # the SAME production stage (shared helper), not a re-inline
        n_cand = dedup.embedding_ann_candidates(e).count()
        all_pairs = n * (n - 1) // 2
        same = (
            qs["dedup_embedding_ann"].builder(spark, d).count()
        )
        brute_s = f"{brute:8.2f}" if brute is not None else f"{'-':>8s}"
        speedup = f"{brute / ann:6.1f}x" if brute is not None else f"{'-':>7s}"
        print(
            f"{os.path.basename(d.rstrip('/')):24s} {n:7d} {brute_s} {ann:8.2f} "
            f"{speedup} {n_cand:10d} {all_pairs:12d} "
            f"{100.0 * n_cand / all_pairs:5.1f}% {same:6d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
