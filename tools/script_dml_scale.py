"""Scale check for the r6 script-runner DML surface (MERGE INTO,
UPDATE...FROM, the statements a reference user's nightly load runs) at
the sf10 tier — 15 M orders, the same 100× jump the bench queries get
in tools/scale_trend.py.

What is measured: one verbatim MERGE INTO of a 1.5 M-row delta into a
15 M-row snapshot (the full-outer merge plan: ONE key-partitioned
shuffle per side + the runtime multi-match guard's window over the
delta), and one UPDATE...FROM against the same snapshot. Wall includes
executing the final aggregate over the merged result (forces the whole
plan).

Run:  python tools/script_dml_scale.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from sql_redshift_etl_spark.functions.script_runner import run_redshift_script  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "_scratch", "sf10")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .appName("script_dml_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    orders.createOrReplaceTempView("sc_orders")
    print(f"orders rows: {n:,}")

    t0 = time.time()
    out = run_redshift_script(
        spark,
        """
        CREATE TEMP TABLE snap AS
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM sc_orders;

        CREATE TEMP TABLE delta AS
        SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        FROM sc_orders WHERE o_orderkey % 10 = 3;

        MERGE INTO snap USING delta d ON snap.o_orderkey = d.o_orderkey
        WHEN MATCHED THEN UPDATE SET
            o_orderstatus = d.o_orderstatus, o_totalprice = d.o_totalprice
        WHEN NOT MATCHED THEN INSERT VALUES
            (d.o_orderkey, d.o_orderstatus, d.o_totalprice);

        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CONVERT(DECIMAL(20,4), o_totalprice)) AS DOUBLE) AS total
        FROM snap GROUP BY 1;
        """,
    )
    rows = out.collect()
    t_merge = time.time() - t0
    print(f"MERGE INTO (delta={n // 10:,} into {n:,}): {t_merge:.1f}s; "
          f"statuses={sorted((r['o_orderstatus'], r['n']) for r in rows)}")

    t0 = time.time()
    out = run_redshift_script(
        spark,
        """
        CREATE TEMP TABLE snap2 AS
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM sc_orders;

        CREATE TEMP TABLE hot AS
        SELECT o_orderkey FROM sc_orders WHERE o_totalprice > 400000;

        UPDATE snap2 SET o_orderstatus = 'H'
        FROM hot WHERE snap2.o_orderkey = hot.o_orderkey;

        SELECT o_orderstatus, COUNT(*) AS n FROM snap2 GROUP BY 1;
        """,
    )
    rows = out.collect()
    t_upd = time.time() - t0
    print(f"UPDATE...FROM: {t_upd:.1f}s; statuses={sorted((r['o_orderstatus'], r['n']) for r in rows)}")


if __name__ == "__main__":
    main()
