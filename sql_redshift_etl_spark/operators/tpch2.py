"""TPC-H shapes 2/2 — the remaining classic queries (Q2/Q4/Q9/Q11/Q12/
Q16/Q20/Q21) adapted to the fixture schema, completing all 22 shapes
(Q1 = flagship_pricing_summary; Q3/5/6/7/8/10/13/14/15/17/18/19/22 in
operators/tpch.py).

"Adapted" because the fixtures carry no partsupp table and no
l_commitdate/l_receiptdate/l_shipmode columns (FIXTURES.md), so the
canonical predicates are re-expressed over what exists while preserving
each query's SHAPE — the part the engine is graded on:
- Q2's min-cost-supplier correlated subquery → min offer derived from
  lineitem, resolved per part via rank-1 (WindowGroupLimit);
- Q4/Q12's commit-vs-receipt lateness → shipdate lagging orderdate;
- Q9's ps_supplycost profit term → p_retailprice × quantity cost proxy;
- Q11's availqty value share → revenue share vs a scalar-subquery total;
- Q16's complaint-supplier exclusion → negative-balance exclusion;
- Q20's half-of-availqty threshold → fixed shipped-quantity threshold;
- Q21's multi-EXISTS "sole late supplier" → per-order max-shipdate
  window aggregation (same semantics, one pass, no correlated rescans).

All money math follows functions.dialect exact-decimal rules so every
query is DuckDB-oracled bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.functions.dialect import ONE_DEC_SQL, dec, money, one_rate, rate
from sql_redshift_etl_spark.plans.registry import register
from sql_redshift_etl_spark.scale import maybe_broadcast

_ONE = ONE_DEC_SQL


@register(
    "q2_min_cost_supplier",
    tags=("J7", "W6", "§3.2"),
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), ranked AS (
            SELECT p.p_partkey, p.p_name, o.l_suppkey, CAST(o.offer AS DOUBLE) AS offer,
                   ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                      ORDER BY o.offer, o.l_suppkey) AS rn
            FROM part p JOIN offers o ON o.l_partkey = p.p_partkey
            WHERE p.p_type = 'STANDARD' AND p.p_size <= 5
        )
        SELECT r.p_partkey, r.p_name, s.s_name, n.n_name,
               CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, r.offer
        FROM ranked r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE r.rn = 1
        ORDER BY s_acctbal DESC, n.n_name, s.s_name, r.p_partkey
        LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated-min
    resolved as rank-1 per part, the decorrelated form).

    Scale: offers aggregate shuffles on (part, supplier) — the only
    big exchange; the rank-1 filter plans as WindowGroupLimit so no
    full per-part sort materializes; part (filtered) and the dims
    broadcast. The canonical correlated `WHERE cost = (SELECT MIN ...)`
    would rescan partsupp per part — this form is one pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("offer")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5)
    )
    w = Window.partitionBy("p_partkey").orderBy("offer", "l_suppkey")
    ranked = (
        maybe_broadcast(p.select("p_partkey", "p_name"))
        .join(offers, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        ranked.join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("offer").cast("double").alias("offer"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority",
    tags=("J3", "A1"),
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order count by priority for orders with at least
    one late line (shipdate > orderdate + 60 days standing in for the
    missing commitdate < receiptdate).

    Scale: EXISTS plans as a LEFT SEMI join on orderkey — lineitem is
    never widened or aggregated, just probed; the date filter prunes
    orders before the shuffle; the 5-group aggregate is trivial.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return bounded_sort(
        late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")),
        "o_orderpriority",
    )


@register(
    "q9_product_type_profit",
    tags=("J7", "A1"),
    oracle=f"""
        SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(2,0))
                          * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
        ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for one
    part family (revenue minus a retailprice×quantity cost proxy — the
    fixtures have no ps_supplycost).

    Scale: the part-name filter broadcasts and prunes lineitem before
    the orders shuffle; supplier/nation broadcast; all money terms stay
    exact long-backed decimals (products ≤ precision 18) until the final
    double cast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    one = one_rate()
    profit_term = money("l_extendedprice") * (one - rate("l_discount")) - money(
        "p_retailprice"
    ) * dec("l_quantity", 0, 2) * F.lit(0.10).cast("decimal(3,2)")
    return bounded_sort(
        li.join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit_term).cast("double").alias("profit")),
        "nation",
        F.col("o_year").desc(),
    )


@register(
    "q11_important_value_share",
    tags=("A1", "§3.2"),
    oracle=f"""
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * ({_ONE} - CAST(l_discount AS DECIMAL(18,2)))) AS value
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, CAST(value AS DOUBLE) AS value
        FROM per_supp
        WHERE CAST(value AS DOUBLE) >
              0.011 * (SELECT CAST(SUM(value) AS DOUBLE) FROM per_supp)
        ORDER BY value DESC, l_suppkey
    """,
)
def q11_important_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose revenue exceeds a fraction of
    the global total — the HAVING-against-scalar-subquery pattern
    (availqty×supplycost value becomes lineitem revenue).

    Scale: one shuffle for the per-supplier aggregate; the global total
    re-aggregates the per-supplier partials (tiny) and broadcasts back
    as a 1-row cross join — the corpus is never scanned twice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = one_rate()
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(money("l_extendedprice") * (one - rate("l_discount"))).alias("value")
    )
    total = per_supp.agg(F.sum("value").cast("double").alias("total"))
    return bounded_sort(
        per_supp.crossJoin(F.broadcast(total))
        .where(F.col("value").cast("double") > 0.011 * F.col("total"))
        .select("l_suppkey", F.col("value").cast("double").alias("value")),
        F.col("value").desc(),
        "l_suppkey",
        # the per-supplier aggregate MERGE is unbounded — only the
        # >1.1%-share output (<=90 rows) is; keep the merge parallel
        barrier=True,
    )


@register(
    "q12_late_shipment_priority",
    tags=("A9", "F3"),
    oracle="""
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority line counts per category
    for late shipments (returnflag stands in for the missing shipmode;
    shipdate-vs-orderdate lag for the commit/receipt pair).

    Scale: the shipdate range predicate is pushed to the lineitem scan;
    the lateness predicate is a join-time filter (needs both sides); the
    conditional counts are one map-side partial aggregation — the
    classic A9 FILTER/CASE pattern with a 3-row result.
    """
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return bounded_sort(
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        ),
        "l_returnflag",
    )


@register(
    "q16_supplier_variety",
    tags=("A2", "J3"),
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    combination, excluding flagged suppliers (negative balance standing
    in for the complaint predicate) — COUNT(DISTINCT) + NOT IN anti-join.

    Scale: the excluded-supplier set is tiny and plans as a broadcast
    anti join (never a shuffle of lineitem by itself); part's attribute
    filters broadcast; the distinct-count shuffles once on the grouped
    attributes with partial distinct aggregation upstream.
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(list(range(1, 9))))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return bounded_sort(
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(maybe_broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")),
        F.col("supplier_cnt").desc(),
        "p_brand",
        "p_type",
        "p_size",
    )


@register(
    "q20_volume_suppliers",
    tags=("J3", "A1"),
    oracle="""
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_name LIKE 'small%'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey
            HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 300
        )
        ORDER BY s.s_name
    """,
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of one part
    family in a year — the IN-(aggregated-subquery) semi-filter chain
    (fixed threshold standing in for half-of-availqty).

    Scale: part-name filter broadcasts into the lineitem scan's probe;
    the aggregate keys on suppkey (bounded by |suppliers|); the HAVING
    survivor set is tiny and semi-joins broadcast against supplier.
    Quantity is integral (FIXTURES.md) so the BIGINT sum is exact.
    """
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    movers = (
        li.join(maybe_broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .where(F.col("q") > 300)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_sole_late_supplier",
    tags=("J3", "W6", "A1"),
    oracle="""
        WITH finished AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        ), per_order AS (
            SELECT l_orderkey,
                   MAX(l_shipdate) AS order_max,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM finished GROUP BY l_orderkey
        ), per_supp AS (
            SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max
            FROM finished GROUP BY l_orderkey, l_suppkey
        ), latest AS (
            SELECT ps.l_orderkey, ps.l_suppkey
            FROM per_supp ps
            JOIN per_order po ON po.l_orderkey = ps.l_orderkey
            WHERE po.n_supp >= 2 AND ps.supp_max = po.order_max
        ), sole AS (
            SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
            FROM latest GROUP BY l_orderkey HAVING COUNT(*) = 1
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE latest shipper on
    multi-supplier finished orders — the canonical EXISTS/NOT-EXISTS
    pair, re-expressed as one per-order window aggregation (same
    semantics: another supplier exists on the order, and nobody shipped
    later than this one).

    Scale: the canonical form rescans lineitem twice per outer row;
    this form shuffles lineitem ONCE on orderkey, computes the order
    max / supplier count / per-supplier max in the same exchange's
    window pass, and everything downstream is order-granular (small).
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    finished = li.join(
        o.select("o_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    wo = Window.partitionBy("l_orderkey")
    per_supp = finished.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    enriched = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_max",
        F.max("supp_max").over(wo).alias("order_max"),
        F.count(F.lit(1)).over(wo).alias("n_supp"),
    )
    latest = enriched.where(
        (F.col("n_supp") >= 2) & (F.col("supp_max") == F.col("order_max"))
    )
    sole = (
        latest.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("n_latest"))
        .where(F.col("n_latest") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(maybe_broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
