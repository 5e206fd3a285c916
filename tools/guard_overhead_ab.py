"""A/B cost of plpgsql EXCEPTION guards (r7): the same three-DML load
run bare vs inside a BEGIN ... EXCEPTION WHEN OTHERS block.

What the guard buys: honest catch timing — every mutated binding
materializes (localCheckpoint) at its own statement, so an execution
error routes to the handler AT that statement and the snapshot rollback
is real. What it costs: one materialization of the WHOLE bound table per
guarded mutation — O(K·N) for K guarded statements over an N-row table,
the same shape Redshift itself pays (each statement writes its result to
disk). This tool measures that cost at a real tier so the docstring's
"guard the risky statements, not bulk loads one level up" advice carries
a number.

A (bare): CREATE stage AS select; INSERT; UPDATE; DELETE; final count —
   one lazy composed plan, materialized once at the count.
B (guarded): the same INSERT/UPDATE/DELETE inside one EXCEPTION block —
   three eager localCheckpoints + the final count.
C (caught): same as B but the UPDATE divides by zero — measures the
   error path: snapshot restore + handler, then the final count sees the
   pre-block stage.

Run:  python tools/guard_overhead_ab.py [sf_dir]   (default _scratch/sf1)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from sql_redshift_etl_spark.functions.script_runner import run_redshift_script  # noqa: E402

_BODY = """
    INSERT INTO stage
    SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
    FROM ga_orders WHERE o_orderstatus = 'F';
    UPDATE stage SET o_totalprice = o_totalprice * {mult}
    WHERE o_orderstatus = '1-NEVER' OR o_orderstatus = 'O';
    DELETE FROM stage WHERE MOD(o_orderkey, 10) = 7;
"""

_HEAD = """
    CREATE TEMP TABLE stage AS
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM ga_orders;
    CREATE TEMP TABLE errlog (code VARCHAR(10));
"""

_TAIL = """
    SELECT COUNT(*) AS n, COUNT(e.code) AS n_err
    FROM stage CROSS JOIN (SELECT MAX(code) AS code FROM errlog) e;
"""


def _run(spark, script: str) -> tuple[float, tuple]:
    t0 = time.time()
    out = run_redshift_script(spark, script)
    row = tuple(out.collect()[0])
    return time.time() - t0, row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "_scratch", "sf1")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .appName("guard_overhead_ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    orders.createOrReplaceTempView("ga_orders")
    print(f"orders rows: {n:,}")

    bare = _HEAD + _BODY.format(mult="1.05") + _TAIL
    guarded = (
        _HEAD
        + f"""
        CREATE PROCEDURE load() AS $$
        BEGIN
            BEGIN
                {_BODY.format(mult="1.05")}
            EXCEPTION WHEN OTHERS THEN
                INSERT INTO errlog VALUES (SQLSTATE);
            END;
        END;
        $$ LANGUAGE plpgsql;
        CALL load();
        """
        + _TAIL
    )
    caught = (
        _HEAD
        + f"""
        CREATE PROCEDURE load() AS $$
        BEGIN
            BEGIN
                {_BODY.format(mult="(1 + 1 / (LEN(o_orderstatus) - 1))")}
            EXCEPTION WHEN OTHERS THEN
                INSERT INTO errlog VALUES (SQLSTATE);
            END;
        END;
        $$ LANGUAGE plpgsql;
        CALL load();
        """
        + _TAIL
    )

    for tag, script in (("A bare", bare), ("B guarded", guarded), ("C caught", caught)):
        # steady of 2 runs (first pays scan warmup)
        _run(spark, script)
        secs, row = _run(spark, script)
        print(f"{tag:10s} wall {secs:7.2f} s  result {row}")
    spark.stop()


if __name__ == "__main__":
    main()
