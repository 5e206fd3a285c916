#!/usr/bin/env python
"""A/B: join_star_revenue on the raw layout (SortMergeJoin with both
fact sides shuffled on l_orderkey/o_orderkey) vs a bucketed DISTKEY
layout (lineitem + orders bucketed AND sorted on the order key, same
bucket count → co-located join, no pre-join exchange, no sort).

VERDICT r3 item 2: join_star_revenue is the one bench query whose
DuckDB ratio does NOT fall with scale (13× at sf10) — the 60 M-row
lineitem⋈orders shuffle is the honest cost, eager pre-aggregation
measured 2× WORSE (BASELINE.md r3), and the bucketed layout is the
remaining untested idea. This tool measures it; the result goes to
BASELINE.md as adopt or measured-and-rejected.

Usage: python tools/star_join_ab.py [sf_dir ...] [--buckets N]
Defaults to _scratch/sf1 and _scratch/sf10 (make with
SCALE_FACTOR_X={10,100} python tools/make_scaled_data.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.functions.dialect import money, one_rate, rate  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.sources.writers import write_bucketed_table  # noqa: E402


def _star_from(li: DataFrame, o: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join_star_revenue body with injectable fact tables (joins.py:252)."""
    o = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    one = one_rate()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def _q3_from(li: DataFrame, o: DataFrame, spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q3_shipping_priority body with injectable fact tables
    (tpch.py:40) — added r5: q3's lineitem⋈orders join keys on the SAME
    order key the adopted DISTKEY layout buckets on, so the one-time
    layout should serve this query too; this measures whether it does."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = o.where(F.col("o_orderdate") < cutoff)
    li = li.where(F.col("l_shipdate") > cutoff)
    one = one_rate()
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _best_of(df: DataFrame, runs: int = 5) -> float:
    df.write.format("noop").mode("overwrite").save()  # cold/warmup
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges are the point of the
    star plan; the bucketed layout targets the hash-partition shuffles)."""
    return (
        df._jdf.queryExecution().executedPlan().toString().count("Exchange hashpartitioning")
    )


def measure(spark: SparkSession, sf_dir: str, n_buckets: int) -> dict:
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_t, o_t = f"li_bkt_{tag}", f"o_bkt_{tag}"

    t0 = time.perf_counter()
    # One file per bucket (repartition on the key first) + sortBy: the
    # co-located SMJ can then skip both the exchange and the sort.
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem").repartition(n_buckets, "l_orderkey"),
        li_t,
        bucket_by=["l_orderkey"],
        num_buckets=n_buckets,
        sort_by=["l_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").repartition(n_buckets, "o_orderkey"),
        o_t,
        bucket_by=["o_orderkey"],
        num_buckets=n_buckets,
        sort_by=["o_orderkey"],
    )
    stage_secs = round(time.perf_counter() - t0, 2)

    plain = all_queries()["join_star_revenue"].builder(spark, sf_dir)
    bucketed = _star_from(spark.table(li_t), spark.table(o_t), spark, sf_dir)

    if os.environ.get("AB_SHOW_PLAN"):
        s = bucketed._jdf.queryExecution().executedPlan().toString()
        for line in s.splitlines():
            if any(k in line for k in ("Exchange", "Scan", "SortMergeJoin", "Sort ", "Bucketed")):
                print(line.rstrip()[:160], file=sys.stderr)

    a = _best_of(plain)
    b = _best_of(bucketed)
    rows_a = sorted(map(tuple, plain.collect()))
    rows_b = sorted(map(tuple, bucketed.collect()))

    q3_plain = all_queries()["q3_shipping_priority"].builder(spark, sf_dir)
    q3_bucketed = _q3_from(spark.table(li_t), spark.table(o_t), spark, sf_dir)
    q3_a = _best_of(q3_plain)
    q3_b = _best_of(q3_bucketed)
    q3_match = [tuple(r) for r in q3_plain.collect()] == [tuple(r) for r in q3_bucketed.collect()]

    return {
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "stage_secs": stage_secs,
        "plain_best5_sec": a,
        "bucketed_best5_sec": b,
        "speedup": round(a / b, 2) if b else None,
        "plain_exchanges": _exchanges(plain),
        "bucketed_exchanges": _exchanges(bucketed),
        "results_match": rows_a == rows_b,
        "q3_plain_best5_sec": q3_a,
        "q3_bucketed_best5_sec": q3_b,
        "q3_speedup": round(q3_a / q3_b, 2) if q3_b else None,
        "q3_plain_exchanges": _exchanges(q3_plain),
        "q3_bucketed_exchanges": _exchanges(q3_bucketed),
        "q3_results_match": q3_match,
    }


def main() -> None:
    n_buckets = 32
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):  # accept both --buckets=N and --buckets N
        a = argv[i]
        if a.startswith("--buckets"):
            if "=" in a:
                n_buckets = int(a.split("=", 1)[1])
            else:
                i += 1
                if i == len(argv):
                    raise SystemExit("--buckets requires a value")
                n_buckets = int(argv[i])
        else:
            args.append(a)
        i += 1
    dirs = args or [
        os.path.join(REPO_ROOT, "_scratch", "sf1"),
        os.path.join(REPO_ROOT, "_scratch", "sf10"),
    ]
    spark = get_spark("star-join-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}: not found", file=sys.stderr)
            continue
        print(json.dumps(measure(spark, d, n_buckets)))
    spark.stop()


if __name__ == "__main__":
    main()
