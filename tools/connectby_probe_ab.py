#!/usr/bin/env python
"""A/B: what the CONNECT BY lookahead probes actually cost at scale.

The r9 docstrings claim CONNECT_BY_ISLEAF (and the NOCYCLE
ISLEAF/ISCYCLE variant) add "one frontier-step-shaped join, bounded by
the result set" — this measures it instead of leaving it a claim. The
walk covers the WHOLE customer table (START WITH keys 1-9; every key k
has parent FLOOR(k/10), so the forest reaches every row and the result
set == the table), which is the worst case for the probe: its DISTINCT
parent-tuple input is maximal relative to the walk.

Variants, identical walk underneath:
  walk      — id + LEVEL only (the baseline recursion)
  isleaf    — + CONNECT_BY_ISLEAF (distinct-parent probe join)
  nocycle   — + NOCYCLE + ISLEAF + ISCYCLE (path-carrying probe: the
              DISTINCT includes the ancestor-path string and the base
              side computes the escaped child key)

Usage: python tools/connectby_probe_ab.py [sf_dir ...]
       (default: /root/repo/_scratch/sf1 /root/repo/_scratch/sf10)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.functions.redshift_sql import (  # noqa: E402
    run_redshift_sql,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402

_WALK = """
    SELECT c_custkey, CAST(LEVEL AS BIGINT) AS lvl{extra}
    FROM ab_cb_customer
    START WITH c_custkey BETWEEN 1 AND 9
    CONNECT BY {nocycle}PRIOR c_custkey = FLOOR(c_custkey / 10)
"""

_VARIANTS = {
    "walk": {"extra": "", "nocycle": ""},
    "isleaf": {
        "extra": ", CAST(CONNECT_BY_ISLEAF AS BIGINT) AS isleaf",
        "nocycle": "",
    },
    "nocycle": {
        "extra": (
            ", CAST(CONNECT_BY_ISLEAF AS BIGINT) AS isleaf"
            ", CAST(CONNECT_BY_ISCYCLE AS BIGINT) AS iscycle"
        ),
        "nocycle": "NOCYCLE ",
    },
}


def _best(fn, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    dirs = sys.argv[1:] or [
        os.path.join(REPO_ROOT, "_scratch", "sf1"),
        os.path.join(REPO_ROOT, "_scratch", "sf10"),
    ]
    spark = get_spark("connectby-probe-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # Spark guards recursive CTEs with BOTH a depth limit (100, the
    # cyclic-data safety valve the rewriter's docs lean on) and a total
    # ROW limit (1M) — a legitimate >1M-row hierarchy hits the latter,
    # so a real deployment raises it; the depth guard still bounds
    # runaway recursion. sf10's walk emits 1.5M rows.
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(50_000_000))
    for sf_dir in dirs:
        cust = load_table(spark, sf_dir, "customer")
        cust.createOrReplaceTempView("ab_cb_customer")
        # every key >= 1 bottoms out at a digit root 1-9; a key 0 (the
        # scaled tiers re-key from 0) is its own FLOOR(0/10) parent and
        # is genuinely unreachable — exclude it from the expectation
        n = cust.filter("c_custkey >= 1").count()
        print(f"\n{sf_dir}  ({n:,} reachable rows; walk covers them all)")
        base = None
        for name, parts in _VARIANTS.items():
            sql = _WALK.format(**parts)
            rows = 0

            def _run():
                nonlocal rows
                rows = run_redshift_sql(spark, sql).count()

            _run()  # warm
            t = _best(_run)
            assert rows == n, f"{name}: walk missed rows ({rows} != {n})"
            if base is None:
                base = t
            print(
                f"  {name:8s}: {t:7.3f}s  ({t / base:4.2f}x walk; "
                f"{rows:,} rows out)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
