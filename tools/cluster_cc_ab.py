#!/usr/bin/env python
"""A/B: dedup_cluster_components label-propagation restructure (r14).

Current shape: every round joins the previous label frame TWICE (lu on
u, lv on v), so the logical lineage of round k contains 2^(k+1)-1
copies of the symmetric edge list (15 at k=3), each of which is 2
copies of the full MinHash-LSH pairs pipeline. Candidate: add self-edges
(u,u) to the edge list so a node's own label arrives as a normal
message — each round then references the label frame ONCE and the
recurrence lbl_k(u) = min(lbl_{k-1}(u), min_nbr lbl_{k-1}(v)) is
unchanged.

Runs BOTH variants alternating in one session (noop sink, best-of-N),
asserts row identity first, and reports jobs/stages via the status
tracker plus ReusedExchange counts from the executed plan.

Usage: python tools/cluster_cc_ab.py [sf_dir] [n_timed]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    _CLUSTER_ROUNDS,
    dedup_minhash_lsh,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.staging import stage_inputs  # noqa: E402


def min_label_propagate_twojoin(edges: DataFrame, rounds: int) -> DataFrame:
    """The PRE-r14 form, inlined verbatim so this A/B stays reproducible
    after dedup.min_label_propagate adopted the self-edge variant
    (r14 self-review: importing the library kernel as the 'current' arm
    made both arms identical): every round joins the previous label
    frame twice (lu on u, lv on v) — 2^(k+1)-1 edge-list copies in
    round k's lineage."""
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    lbl = sym.groupBy("u").agg(F.least(F.first("u"), F.min("v")).alias("lbl"))
    lbl = lbl.select(F.col("u").alias("doc_id"), "lbl")
    for _ in range(rounds):
        lu = lbl.select(F.col("doc_id").alias("u"), F.col("lbl").alias("lbl_u"))
        lv = lbl.select(F.col("doc_id").alias("v"), F.col("lbl").alias("lbl_v"))
        lbl = (
            sym.join(lu, "u")
            .join(lv, "v")
            .groupBy("u", "lbl_u")
            .agg(F.min("lbl_v").alias("min_nbr"))
            .select(
                F.col("u").alias("doc_id"),
                F.least("lbl_u", "min_nbr").alias("lbl"),
            )
        )
    return lbl


def min_label_propagate_selfedge(edges: DataFrame, rounds: int) -> DataFrame:
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    sym = sym.union(sym.select("u", F.col("u").alias("v")).distinct())
    lbl = sym.groupBy("u").agg(F.min("v").alias("lbl")).select(
        F.col("u").alias("doc_id"), "lbl"
    )
    for _ in range(rounds):
        lbl = (
            sym.join(lbl, sym["v"] == lbl["doc_id"])
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("u").alias("doc_id"), "lbl")
        )
    return lbl


def summarize(lbl: DataFrame) -> DataFrame:
    return (
        lbl.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("n_members"), F.max("doc_id").alias("max_member"))
        .select(F.col("lbl").alias("cluster"), "n_members", "max_member")
        .orderBy("cluster")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("cluster-cc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    target = os.path.join(
        REPO_ROOT, "_scratch", "bench_staged", os.path.basename(sf_dir.rstrip("/"))
    )
    data_dir = stage_inputs(spark, sf_dir, target)
    tracker = spark.sparkContext.statusTracker()

    pairs = dedup_minhash_lsh(spark, data_dir).select("doc_a", "doc_b")
    cur = summarize(min_label_propagate_twojoin(pairs, _CLUSTER_ROUNDS))
    new = summarize(min_label_propagate_selfedge(pairs, _CLUSTER_ROUNDS))

    a = cur.collect()
    b = new.collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "ROW IDENTITY FAILED"
    print(f"row identity OK ({len(a)} clusters)")

    results: dict[str, list[float]] = {"current": [], "selfedge": []}
    jobs: dict[str, int] = {}
    for df, tag in ((cur, "current"), (new, "selfedge")):
        df.write.format("noop").mode("overwrite").save()  # warm
    for i in range(n_timed):
        for df, tag in ((cur, "current"), (new, "selfedge")):
            group = f"{tag}-{i}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            results[tag].append(time.perf_counter() - t0)
            jobs[tag] = len(tracker.getJobIdsForGroup(group) or [])
            spark.sparkContext.setJobGroup(None, None)

    for tag, ts in results.items():
        print(
            f"{tag:9s} best={min(ts):.4f} all={[round(t, 3) for t in sorted(ts)]} "
            f"jobs/run={jobs[tag]}"
        )


if __name__ == "__main__":
    main()
