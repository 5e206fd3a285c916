#!/usr/bin/env python
"""A/B: does ANALYZE TABLE ... COMPUTE STATISTICS (+ CBO) change any
plan at our tiers? — SURVEY §4's own action line ("run ANALYZE so CBO
join reordering triggers"), never exercised with a measured A/B until
r13 (VERDICT r12 "what's missing" #3).

Method: stage the TPC-H-ish tables as MANAGED tables (catalog stats
only attach to catalog tables — a bare parquet path has nowhere to put
them, which is WHY the engine's ANALYZE script statement is a no-op for
snapshot-bound temp views), then plan + time three representative join
shapes under three configs:

  A  cbo=off, no stats            (the engine's shipping behavior)
  B  cbo=on + joinReorder, no stats
  C  cbo=on + joinReorder, AFTER ANALYZE ... FOR ALL COLUMNS

and diff the physical plans: Exchange count, BroadcastHashJoin /
SortMergeJoin counts, and the leaf-relation order (a proxy for join
order). The three shapes are chosen to give CBO something to do:

  q3_chain   the q3 3-way chain written in a deliberately bad FROM
             order (lineitem first, customer second — they only
             connect through orders), so rule-based ReorderJoin vs
             cost-based joinReorder is visible;
  star5      the join_star_revenue 5-way star, FROM order fact-last;
  seljoin    a HIGHLY selective dimension filter (o_totalprice >
             p99.9) joined to lineitem — the classic stats win: only
             column stats can tell the planner the post-filter side is
             broadcastable at PLAN time (AQE can only discover it at
             RUNTIME after materializing the shuffle).

Results go to BASELINE.md as adopt / measured-no-effect, either way
closing the SURVEY §4 line honestly.

Usage: python tools/cbo_analyze_ab.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from sql_redshift_etl_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "orders", "lineitem"]

QUERIES = {
    # deliberately bad FROM order: lineitem and customer share no key
    "q3_chain": """
        SELECT o.o_orderkey,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM {p}lineitem l, {p}customer c, {p}orders o
        WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
          AND c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > DATE '1995-03-15'
        GROUP BY o.o_orderkey ORDER BY revenue DESC LIMIT 10
    """,
    "star5": """
        SELECT n.n_name, SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM {p}region r, {p}nation n, {p}customer c, {p}orders o, {p}lineitem l
        WHERE r.r_regionkey = n.n_regionkey AND n.n_nationkey = c.c_nationkey
          AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
          AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    "seljoin": """
        SELECT COUNT(*) AS n, SUM(l.l_quantity) AS qty
        FROM {p}orders o JOIN {p}lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > {p999}
    """,
}


def plan_signature(spark: SparkSession, sql: str) -> dict:
    plan = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    leaves = [
        m.split(".")[-1].removeprefix("cbo_")
        for m in re.findall(r"FileScan parquet (\S+?)\[", plan)
    ]
    return {
        "exchanges": plan.count("Exchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "scan_order": leaves,
    }


def best_of(spark: SparkSession, sql: str, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.sql(sql).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # orphaned managed-table dirs make saveAsTable fail (memory trap):
    # clean the default warehouse before staging
    shutil.rmtree(os.path.join(os.getcwd(), "spark-warehouse"), ignore_errors=True)
    spark = get_spark("cbo-analyze-ab")
    spark.sparkContext.setLogLevel("ERROR")

    for t in TABLES:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).write.mode(
            "overwrite"
        ).saveAsTable(f"cbo_{t}")
    p999 = spark.sql(
        "SELECT percentile_approx(o_totalprice, 0.999) FROM cbo_orders"
    ).first()[0]

    def fmt(q: str) -> str:
        return q.format(p="cbo_", p999=p999)

    out: dict = {"sf_dir": sf_dir, "p999": float(p999), "configs": {}}
    # Config order matters: catalog column stats ACCUMULATE (ANALYZE FOR
    # COLUMNS adds to whatever is already recorded), so the non-NTZ
    # config must run before the all-columns one. C is kept LAST and
    # expected to fail on the date-filtered shapes: Spark 4.1.2's
    # FilterEstimation hits scala.MatchError on a TimestampNTZType
    # column WITH recorded stats (the fixture's parquet timestamps are
    # all NTZ via inferTimestampNTZ) — captured per-query, a finding in
    # its own right.
    for cfg, cbo, stats in (("A_noCBO", False, None),
                            ("B_CBO_noStats", True, None),
                            ("D_CBO_statsNoNTZ", True, "nontz"),
                            ("C_CBO_statsAll", True, "all")):
        spark.conf.set("spark.sql.cbo.enabled", str(cbo).lower())
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        if stats:
            t0 = time.perf_counter()
            for t in TABLES:
                if stats == "all":
                    spark.sql(
                        f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS"
                    )
                else:
                    cols = [
                        f.name
                        for f in spark.table(f"cbo_{t}").schema.fields
                        if not str(f.dataType).startswith("TimestampNTZ")
                    ]
                    spark.sql(
                        f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS "
                        f"FOR COLUMNS {', '.join(cols)}"
                    )
            out[f"analyze_sec_{stats}"] = round(time.perf_counter() - t0, 2)
        res = {}
        for name, q in QUERIES.items():
            # per-query error capture: Spark 4.1.2's CBO estimation can
            # hit internal errors on fixture types (TimestampNTZ) — a
            # finding to RECORD, not a reason to lose the other cells
            try:
                sig = plan_signature(spark, fmt(q))
                sig["best_sec"] = best_of(spark, fmt(q))
            except Exception as e:
                first = str(e).splitlines()[0] if str(e) else repr(e)
                cause = next(
                    (ln.strip() for ln in str(e).splitlines() if "MatchError" in ln),
                    first[:200],
                )
                sig = {"error": cause}
            res[name] = sig
            print(f"# {cfg} {name}: {sig}", file=sys.stderr, flush=True)
        out["configs"][cfg] = res

    # AQE-off probe for seljoin under C: is the plan-time broadcast (vs
    # AQE's runtime rescue) actually stats-driven?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        out["seljoin_noAQE_C"] = plan_signature(spark, fmt(QUERIES["seljoin"]))
    except Exception as e:
        out["seljoin_noAQE_C"] = {"error": str(e).splitlines()[0][:200]}
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    out["seljoin_noAQE_A"] = plan_signature(spark, fmt(QUERIES["seljoin"]))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps(out, indent=2))
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
    spark.stop()
    shutil.rmtree(os.path.join(os.getcwd(), "spark-warehouse"), ignore_errors=True)


if __name__ == "__main__":
    main()
