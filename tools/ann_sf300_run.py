#!/usr/bin/env python
"""One-tier extension of the ANN carry-plan evidence (VERDICT r5 item 6):
6 M vectors (factor-3000 embeddings tier, _scratch/sf300). The carry
plan's shuffle is O(n·bands·dim); the 240 GB-spill failure of the old
distinct-then-join plan at sf100 made this slope load-bearing, so one
measured point at 3× confirms it. Single timed pass (count of verified
pairs at τ=0.9) — the tier exists for the slope, not for best-of-N
micro-timing; JVM warm-up is amortized by a small prior job.

Usage: python tools/ann_sf300_run.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    ann_banding_for,
    embedding_ann_pairs_df,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "_scratch", "sf300")
    spark = get_spark("ann-sf300")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    emb = load_table(spark, d, "embeddings")
    n_vec = emb.count()
    n_bands, band_bits = ann_banding_for(n_vec)
    ann = embedding_ann_pairs_df(emb, n_bands=n_bands, band_bits=band_bits, tau=0.9)
    t0 = time.perf_counter()
    pairs = ann.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sf_dir": d,
                "n_vectors": n_vec,
                "ann_bands": n_bands,
                "ann_band_bits": band_bits,
                "ann_pairs_tau09": pairs,
                "ann_wall_s": round(wall, 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
