"""End-to-end ETL pipeline (the reference's actual shape — SURVEY.md
§3.1): staging → conformed dimensions → fact build → partitioned
publish → downstream consumption, as one composable DAG.

A sql-redshift-etl project is exactly this chain of SQL scripts; here
the whole chain is ONE Catalyst plan up to the publish boundary
(filters push through every "staging table" because they're views, not
materializations), then a real partitioned write and re-read proves the
published mart serves the downstream query.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dec, money, one_rate, rate
from sql_redshift_etl_spark.plans.registry import register
from sql_redshift_etl_spark.sources.writers import unload_parquet



@register(
    "etl_star_mart_publish",
    tags=("S4", "S6", "S7", "J7", "A1", "E6"),
    oracle="""
        SELECT r.r_name AS region,
               EXTRACT(year FROM o.o_orderdate) AS order_year,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS net_revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus <> 'P'
        GROUP BY region, order_year
    """,
)
def etl_star_mart_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full warehouse ETL round trip:

    1. *Staging* (views, not materialized): non-pending orders, enriched
       customer dim (customer⋈nation⋈region).
    2. *Fact build*: lineitem ⋈ staged orders ⋈ dim → net revenue grain.
    3. *Publish*: UNLOAD the mart partitioned by region (the
       DISTKEY/partition-pruning layout), SORTKEY order_year within.
    4. *Consume*: re-read the published mart and aggregate — what a BI
       query would run. The oracle computes the same result straight
       from the raw tables, proving the whole pipeline is lossless.
    """
    from sql_redshift_etl_spark.sources.queries import _io_dir

    mart_path = _io_dir(sf_dir, "mart_region_year")

    orders_staged = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(load_table(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load_table(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("r_name").alias("region"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    one = one_rate()
    fact = (
        li.join(orders_staged, li.l_orderkey == orders_staged.o_orderkey)
        .join(cust_dim, orders_staged.o_custkey == cust_dim.c_custkey)
        .select(
            "region",
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderkey",
            (money("l_extendedprice") * (one - rate("l_discount"))).alias("net_rev_dec"),
        )
    )
    unload_parquet(fact, mart_path, partition_by=["region"], sort_within=["order_year"])
    # Explicit schema: a zero-row slice writes no files, and inference
    # would throw where an empty mart is the correct result.
    mart = spark.read.schema(fact.schema).option("basePath", mart_path).parquet(mart_path)
    return mart.groupBy("region", "order_year").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum("net_rev_dec").cast("double").alias("net_revenue"),
    )
