#!/usr/bin/env python
"""Stage-cumulative decomposition of etl_training_corpus_pipeline (r14,
VERDICT item 3): time each prefix of the composed pipeline as its own
noop action (staged sf tier, warm best-of-3) so the per-stage increment
is attributable, then dump the FULL query's post-execution AQE plan and
count ShuffleQueryStage / ReusedExchange / ReusedQueryStage markers —
the cross-consumer reuse evidence the static census cannot show.

Usage: python tools/pipeline_stage_decompose.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm.curation import CONTEXT_LEN  # noqa: E402
from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    _CLUSTER_ROUNDS,
    bag_fingerprint,
    min_label_propagate,
    minhash_lsh_pairs_df,
)
from sql_redshift_etl_spark.llm.text import quality_predicate  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.staging import stage_inputs  # noqa: E402


def timed(spark, name, df, n=3):
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        spark.sparkContext.setJobDescription(f"pipeline-stage: {name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best:7.3f}")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pipeline-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    data_dir = stage_inputs(
        spark, sf_dir,
        os.path.join(REPO_ROOT, "_scratch", "bench_staged", os.path.basename(sf_dir.rstrip("/"))),
    )

    d = load_table(spark, data_dir, "documents")
    quality = d.where(quality_predicate()).select("doc_id", "text", "source")
    w_fp = Window.partitionBy(bag_fingerprint()).orderBy("doc_id")
    exact = quality.withColumn("rn", F.row_number().over(w_fp)).where(F.col("rn") == 1).drop("rn")
    pairs = minhash_lsh_pairs_df(exact).select("doc_a", "doc_b")
    lbl = min_label_propagate(pairs, _CLUSTER_ROUNDS)
    drop = lbl.where(F.col("lbl") < F.col("doc_id")).select("doc_id")
    final = exact.join(drop, "doc_id", "left_anti")
    toks = final.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    w_pack = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w_pack))
    packed = cum.groupBy("source").agg(
        F.countDistinct(
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / float(CONTEXT_LEN)).cast("long")
        ).alias("n_bins")
    )

    print("== cumulative prefix walls (noop steady, best-of-3) ==")
    timed(spark, "quality", quality)
    timed(spark, "exact (fp window)", exact)
    timed(spark, "pairs (LSH)", pairs)
    timed(spark, "lbl (CC rounds)", lbl)
    timed(spark, "final (anti-join)", final)
    timed(spark, "packed (source window)", packed)

    full = all_queries()["etl_training_corpus_pipeline"].builder(spark, data_dir)
    timed(spark, "FULL ledger", full)

    full.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        full.explain()
    final_plan = buf.getvalue().split("== Initial Plan ==")[0]
    out = os.path.join(REPO_ROOT, "plans", "r14", "pipeline_executed_final_plan.txt")
    with open(out, "w") as fh:
        fh.write(final_plan)
    print("== AQE final plan census ==")
    print("shuffle stages (distinct):", len(set(re.findall(r"ShuffleQueryStage (\d+)", final_plan))))
    print("reused exchanges:", final_plan.count("ReusedExchange"))
    print("reused query stages:", len(re.findall(r"ReusedQueryStage", final_plan)))
    print("file scans:", len(re.findall(r"FileScan \w+", final_plan)))
    print("plan ->", out)
    spark.stop()


if __name__ == "__main__":
    main()
