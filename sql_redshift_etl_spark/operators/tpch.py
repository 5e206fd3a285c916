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


@register(
    "q5_local_supplier_volume",
    tags=("J7", "A1"),
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star+snowflake join, revenue by supplier
    nation where the supplier and customer share a nation.

    Scale: region→nation→supplier is a broadcast chain (dims are tiny at
    any sf; nation is 25 rows even at 100 TB); the only real shuffles are
    customer⋈orders and ⋈lineitem, both pre-pruned by the date filter
    pushed to the orders scan. The c_nationkey = s_nationkey condition
    rides along as a post-join filter on already-joined rows — no extra
    exchange. Final 25-group agg is a near-free single-stage reduce.
    """
    cutoff_lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    cutoff_hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    one = one_rate()
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q10_returned_items",
    tags=("J7", "A1", "O3"),
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in one quarter.

    Scale: quarter filter pushed to the orders scan, returnflag filter
    pushed to the lineitem scan (both prune before any shuffle); nation
    broadcasts; group keys include c_custkey (high cardinality, AQE
    coalesces); TakeOrderedAndProject caps the sort at 20 rows/partition.
    """
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    one = one_rate()
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue_ratio",
    tags=("F3", "A9", "J1"),
    oracle=f"""
        SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS promo_revenue_pct,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share for one month — conditional
    exact-decimal sums surfaced as an IEEE-deterministic ratio.

    Both engines compute (100.0 * promo_double) / total_double in the
    same operation order, so the quotient is bit-identical. Scale: the
    month filter prunes lineitem at the scan; part joins on p_partkey
    (broadcast at fixture sf, shuffle-hash beyond — either is one pass).
    """
    lo = F.lit("1997-03-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    p = load_table(spark, sf_dir, "part")
    one = one_rate()
    rev = money("l_extendedprice") * (one - rate("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(12,4)"))
    ).cast("double")
    total = F.sum(rev).cast("double")
    return li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        ((F.lit(100.0) * promo) / total).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_volume_customer",
    tags=("A1", "J1", "O3"),
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed 300 units —
    a HAVING-subquery semi-filter feeding a 3-way join.

    Scale: the big-order key set is the *aggregated* lineitem (tiny after
    HAVING — ~1e-5 of orders at any sf), joined back as a semi filter;
    AQE turns it into a broadcast join at runtime. The outer aggregation
    then only touches surviving orders. l_quantity is integral, so the
    BIGINT sum is exact in both engines regardless of add order.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
