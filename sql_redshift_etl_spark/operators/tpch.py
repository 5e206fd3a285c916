"""Additional TPC-H-shaped analytic queries — the classic warehouse ETL
report shapes a sql-redshift-etl project ships (SURVEY.md §2 composite
coverage: multi-way joins + conditional aggregation + top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dec, money, one_rate, rate
from sql_redshift_etl_spark.plans.registry import register

_ONE = "CAST(1 AS DECIMAL(18,2))"


@register(
    "q3_shipping_priority",
    tags=("J7", "A1", "O3"),
    bench=True,
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue top-k for one segment.

    Scale: segment + date filters prune both join inputs before the
    shuffle; the aggregation keys on l_orderkey (high cardinality) which
    AQE coalesces; final TakeOrderedAndProject avoids a global sort.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
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


@register(
    "q6_forecast_revenue",
    tags=("F2", "A1"),
    bench=True,
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, the pushdown
    benchmark. All four predicates reach the parquet scan; the job is
    scan-bound — the query whose 100 TB cost is purely I/O."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
