#!/usr/bin/env python
"""A/B: the plpythonu rollup (Arrow-batched pandas UDF) vs the identical
logic as plain Catalyst expressions, on the same session and bytes.

Why: plpythonu is the ONE deliberately-Python execution path in the
engine (arbitrary user bodies can't compile to Catalyst), so its cost
must be CHARACTERIZED, not guessed — the standing measure-don't-guess
discipline. The interesting numbers are (a) the end-to-end slowdown of
a realistic rollup whose group key and one aggregate input come from
Python, and (b) the per-row throughput of the Arrow-batched evaluator,
which is what a 100 TB capacity plan needs (rows/s × executors).

Usage: python tools/pyudf_overhead_ab.py [sf_dir] (default _scratch/sf1)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.functions.redshift_queries import (  # noqa: E402
    _SCRIPT_PYTHON_UDF,
)
from sql_redshift_etl_spark.functions.script_runner import (  # noqa: E402
    run_redshift_script,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402

# the Python side IS the registered query's script (imported, not copied
# — an edit to the registered rollup cannot silently invalidate the
# published overhead numbers); each run_redshift_script call starts a
# fresh script state, so the template's plain CREATE re-runs cleanly.
# The Catalyst twin below must stay logic-identical — the runtime assert
# compares the two result sets every run, so drift fails loudly instead
# of measuring two different queries.
_PY_SCRIPT = _SCRIPT_PYTHON_UDF.format(customer="ab_customer")

_SQL_TWIN = """
    SELECT CASE
             WHEN CAST(c_acctbal AS DOUBLE) > 7500 THEN 'gold'
             WHEN trim(c_mktsegment) = 'AUTOMOBILE' THEN
               CASE WHEN CAST(c_acctbal AS DOUBLE) > 2500
                    THEN 'silver+' ELSE 'bronze+' END
             WHEN CAST(c_acctbal AS DOUBLE) > 2500 THEN 'silver'
             ELSE 'bronze'
           END AS tier,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(regexp_replace(c_name, '[^0-9]', '') AS BIGINT))
                AS BIGINT) AS key_sum
    FROM ab_customer
    GROUP BY 1
"""


def _best(fn, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "_scratch", "sf1")
    spark = get_spark("pyudf-overhead-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("ab_customer")
    n = cust.count()

    py_rows = None

    def _py():
        nonlocal py_rows
        py_rows = {tuple(r) for r in run_redshift_script(spark, _PY_SCRIPT).collect()}

    sql_rows = None

    def _sql():
        nonlocal sql_rows
        sql_rows = {tuple(r) for r in spark.sql(_SQL_TWIN).collect()}

    _py(), _sql()  # warm + values check
    assert py_rows == sql_rows, "A/B values diverged"
    t_py, t_sql = _best(_py), _best(_sql)
    print(f"rows={n}")
    print(f"plpythonu rollup   : {t_py:.4f}s  ({n / t_py:,.0f} rows/s through 2 UDF calls)")
    print(f"catalyst twin      : {t_sql:.4f}s")
    print(f"python-vs-catalyst : {t_py / t_sql:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
