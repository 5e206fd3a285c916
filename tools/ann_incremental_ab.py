#!/usr/bin/env python
"""A/B: incremental ANN registration vs from-scratch (r9 — verdict item 4).

The production claim behind llm/similarity.py's ann_incremental_topk_df
is twofold:

1. **Ingest cost scales with the delta, not the corpus.** A standing
   corpus persists its sign-LSH band relation once; registering new
   vectors pays |delta| probe work. The from-scratch comparator is FULL
   re-registration (every vector re-queried — what a store-less system
   re-runs to keep every vector's neighbors current). Measured via
   delta fractions 1% / 10% / 100%(--full) of the same corpus.
2. **The store amortizes the corpus-side row-local work** (sign bits +
   the precomputed norm column — cosine needs 1 dot/pair instead of 3
   when norms are stored). Measured as the same-output split:
   inline-signed corpus vs parquet-read store.

Values are engine-verified elsewhere (driver oracle at sf0.01,
test_plan_properties plan shape); this tool measures WALL only, warm
best-of-N to a noop sink.

Usage: python tools/ann_incremental_ab.py [sf_dir ...] [--runs=N] [--full]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.llm.similarity import (  # noqa: E402
    _dot,
    ann_incremental_topk_df,
    lsh_bucket_col,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def _live_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    )


def _timed(df, runs: int, warm: bool = True) -> float:
    """Warm best-of-N for cheap measures; for the multi-minute sides
    pass warm=False/runs=1 — a single execution on a hot JVM with the
    store already OS-cached (stated next to every such number)."""
    if warm:
        df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    runs, full, bulk_only, bulk_delta_pct = 1, False, False, 10
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        if a == "--full":
            full = True
        if a == "--bulk-only":
            bulk_only = True
        if a.startswith("--bulk-delta="):
            bulk_delta_pct = int(a.split("=", 1)[1])
            if bulk_delta_pct not in (1, 10):
                raise SystemExit("--bulk-delta accepts 1 or 10 (the two fixture deltas)")
    if not dirs:
        dirs = [os.path.join(REPO_ROOT, "_scratch", "sf10")]
    spark = get_spark("ann-incremental-ab")
    spark.sparkContext.setLogLevel("ERROR")
    store = os.path.join(REPO_ROOT, "_scratch", "io", "ann_store")
    for d in dirs:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        corpus = emb.where(F.col("vec_id") % 10 != 0)
        with_store_cols = corpus.withColumn("bucket", lsh_bucket_col()).withColumn(
            "norm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        )

        t0 = time.perf_counter()
        with_store_cols.write.mode("overwrite").parquet(store)
        t_store = time.perf_counter() - t0
        stored = spark.read.parquet(store)

        out = {
            "sf_dir": d,
            "n_vecs": emb.count(),
            "store_build_s": round(t_store, 2),
            "runs": runs,
        }
        # 1% and 10% ingest deltas against the SAME stored corpus
        delta10 = emb.where(F.col("vec_id") % 10 == 0)
        delta1 = emb.where(F.col("vec_id") % 100 == 0)
        big = out["n_vecs"] > 50_000  # multi-minute probe sides: single-shot
        out["single_shot"] = big

        def _bcast_ok(n_queries: int) -> bool:
            # 37 probes × ~550 B (qvec + key) per query; the 8 g driver
            # measurably fails building a ~1.2 GB probe broadcast
            # (sf30 10% delta), while ~0.4 GB (sf10 10%) succeeds —
            # switch to the documented shuffle-by-bucket path above
            # ~500 MB, the same rule a production ingest would apply.
            return n_queries * 37 * 550 < 500_000_000

        n10 = delta10.count()
        if not bulk_only:  # --bulk-only: skip the r9-characterized phases
            out["ingest_1pct_s"] = round(
                _timed(ann_incremental_topk_df(stored, delta1), runs), 2
            )
            print(json.dumps(out), flush=True)
            out["ingest_10pct_path"] = "broadcast" if _bcast_ok(n10) else "shuffle"
            out["ingest_10pct_s"] = round(
                _timed(
                    ann_incremental_topk_df(
                        stored, delta10, broadcast_probes=_bcast_ok(n10)
                    ),
                    1 if big else runs,
                    warm=not big,
                ),
                2,
            )
            print(json.dumps(out), flush=True)
        # Bucketed-store A/B (r10 — verdict r9 item 4, the
        # span_bucketed_probe_ab methodology transplanted): the layout
        # matters on the SHUFFLE-BY-BUCKET bulk path (the broadcast path
        # never shuffles the store side at all), so both probes below
        # force broadcast_probes=False. The claim to verify is the
        # DISTKEY one: a band relation persisted bucketBy(bucket) feeds
        # the probe join at its own partitioning — one fewer live
        # exchange, a saving that grows with the stored corpus.
        # a previous killed run can leave the warehouse dir orphaned
        # (dir present, table absent) — Spark then refuses even
        # mode("overwrite"); drop both forms before writing
        import shutil

        spark.sql("DROP TABLE IF EXISTS ann_store_bucketed")
        shutil.rmtree(
            os.path.join(REPO_ROOT, "spark-warehouse", "ann_store_bucketed"),
            ignore_errors=True,
        )
        t0 = time.perf_counter()
        (
            with_store_cols.write.mode("overwrite")
            .bucketBy(32, "bucket")
            .sortBy("bucket")
            .saveAsTable("ann_store_bucketed")
        )
        out["store_build_bucketed_s"] = round(time.perf_counter() - t0, 2)
        stored_b = spark.table("ann_store_bucketed")
        # --bulk-delta=1 probes with the 1% batch instead: holds probe
        # work roughly fixed across corpus tiers so the growth of the
        # store-side saving is what the sf10→sf30 comparison isolates
        bulk_delta = delta1 if bulk_delta_pct == 1 else delta10
        out["bulk_delta_pct"] = bulk_delta_pct
        plain_bulk = ann_incremental_topk_df(stored, bulk_delta, broadcast_probes=False)
        buck_bulk = ann_incremental_topk_df(stored_b, bulk_delta, broadcast_probes=False)
        out["bulk_plain_s"] = round(_timed(plain_bulk, 1 if big else runs, warm=not big), 2)
        out["bulk_bucketed_s"] = round(_timed(buck_bulk, 1 if big else runs, warm=not big), 2)
        out["bulk_bucketed_over_plain"] = round(
            out["bulk_bucketed_s"] / out["bulk_plain_s"], 3
        )
        # exchange counts read AFTER execution — the FINAL adaptive plan
        # (AQE may broadcast the probe side at small tiers, where the
        # store layout is irrelevant by construction; the bulk claim is
        # about the tiers where it cannot)
        out["bulk_plain_exchanges"] = _live_exchanges(plain_bulk)
        out["bulk_bucketed_exchanges"] = _live_exchanges(buck_bulk)
        print(json.dumps(out), flush=True)
        if not big and not bulk_only:
            # store-vs-inline split: same output, corpus signed inline.
            # Signing is two orders below the probe (sf1: identical
            # walls), so the big tiers skip the duplicate run.
            out["ingest_10pct_inline_sign_s"] = round(
                _timed(
                    ann_incremental_topk_df(
                        corpus.withColumn("bucket", lsh_bucket_col()), delta10
                    ),
                    runs,
                ),
                2,
            )
        if full:
            # full re-registration: every vector re-queried (store-less
            # steady state). Quadratic in n — gate behind --full. The
            # 100%-"delta" probe relation exceeds broadcast size at big
            # tiers (4.4 GB at sf10 — measured 8g-driver failure), so
            # the comparator takes the documented shuffle-by-bucket
            # path; pair count and per-pair work are identical.
            out["full_reregister_path"] = (
                "broadcast" if _bcast_ok(out["n_vecs"]) else "shuffle"
            )
            out["full_reregister_s"] = round(
                _timed(
                    ann_incremental_topk_df(
                        stored, emb, broadcast_probes=_bcast_ok(out["n_vecs"])
                    ),
                    1 if big else runs,
                    warm=not big,
                ),
                2,
            )
            if "ingest_10pct_s" in out:  # absent under --bulk-only
                out["ingest10_over_full"] = round(
                    out["ingest_10pct_s"] / out["full_reregister_s"], 3
                )
        print(json.dumps(out), flush=True)
    spark.sql("DROP TABLE IF EXISTS ann_store_bucketed")
    spark.stop()


if __name__ == "__main__":
    main()
