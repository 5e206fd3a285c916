#!/usr/bin/env python
"""Before/after capture for the r14 bounded-domain sort sweep.

For each query in the sweep set: dump `.explain("formatted")` to
plans/r14/<query>_<mode>.txt, then run the query as a noop-sink action
(1 warm + 3 timed, guide §1.4) counting jobs/stages via the status
tracker (tools/capture_plans.timed_capture — the shared harness).
Writes a JSON summary to plans/r14/sweep_<mode>.json.

Usage: python tools/bounded_sort_sweep_audit.py before|after [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

from capture_plans import staged_session, timed_capture  # noqa: E402

from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402

# The 22 rangepartitioning queries whose final sort input is bounded
# (key-domain aggregates, explicit row caps, or driver-resident memory
# sinks) — the r13 census's other 17 are left alone (OPTIMIZATION_r14.md).
SWEEP = [
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_value_share",
    "q12_late_shipment_priority",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q22_dormant_accounts",
    "curation_pii_redaction",
    "curation_shard_export",
    "sample_hash_fraction",
    "sample_train_val_test",
    "sample_stratified_per_label",
    "sample_salted_hot_agg",
    "sample_domain_temperature",
    "embedding_pca_project",
    "source_bucketed_distkey_join",
    "stream_stream_interval_join",
    "stream_hll_incremental",
]


def main() -> None:
    mode = sys.argv[1]
    assert mode in ("before", "after"), mode
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(REPO_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    spark, data_dir = staged_session("bounded-sort-sweep", sf_dir)
    qs = all_queries()
    summary: dict[str, dict] = {}
    for name in SWEEP:
        spark.sparkContext.setJobDescription(f"sweep-{mode}: {name} build")
        df = qs[name].builder(spark, data_dir)
        r = timed_capture(
            spark, df, os.path.join(out_dir, f"{name}_{mode}.txt"), f"{name}-{mode}"
        )
        rp = r.pop("plan").count("rangepartitioning")
        summary[name] = {**r, "range_partitionings": rp}
        print(
            f"{name:34s} jobs={r['jobs']} stages={r['stages']} "
            f"steady={r['steady_s']:.3f} rp={rp}"
        )

    with open(os.path.join(out_dir, f"sweep_{mode}.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
