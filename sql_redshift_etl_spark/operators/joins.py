"""Join operators (SURVEY.md §2.3, rows J1-J8).

Scale strategy (applies to every builder here):
- Dimension joins (region/nation/supplier) carry an explicit
  ``F.broadcast`` hint — at 100 TB the fact side never shuffles for them.
- Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE's skew
  join splitting (enabled in session.py) handles hot keys at runtime.
- Non-equi conditions are attached to an equi key wherever semantics
  allow, keeping the plan a hash join + residual filter instead of a
  BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dec, money, nvl, one_rate, rate
from sql_redshift_etl_spark.plans.registry import register

_ONE = "CAST(1 AS DECIMAL(18,2))"


@register(
    "join_inner_broadcast",
    tags=("J1", "J6"),
    oracle="""
        SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join through the dim chain customer→nation→region with
    broadcast hints — zero shuffle for the joins themselves (BroadcastHashJoin),
    only the final aggregation exchanges 125 rows."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .join(r, n.n_regionkey == r.r_regionkey, "inner")
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_balance"),
        )
    )


@register(
    "join_left_outer",
    tags=("J2",),
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               COUNT(o.o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer, including order-less ones (count 0).

    Scale: customer⋈orders is a shuffled hash join on custkey; COUNT(col)
    (not COUNT(*)) preserves the null-row semantics of the outer join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            nvl(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    tags=("J2",),
    oracle="""
        SELECT o.o_orderkey, c.c_custkey, c.c_nationkey
        FROM orders o
        RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
        WHERE c.c_custkey <= 200
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join with a join-side predicate (kept in the ON clause —
    moving it to WHERE would change semantics, a classic outer-join trap).
    Produces genuine NULL o_orderkey rows for unmatched customers."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "P"), "right")
        .where(F.col("c_custkey") <= 200)
        .select("o_orderkey", "c_custkey", "c_nationkey")
    )


@register(
    "join_full_outer",
    tags=("J2",),
    oracle="""
        WITH cust AS (
            SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
        ), supp AS (
            SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               COALESCE(c.n_cust, 0) AS n_cust,
               COALESCE(s.n_supp, 0) AS n_supp
        FROM cust c
        FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates, keys coalesced."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, "nationkey", "full").select(
        F.col("nationkey"),
        nvl(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        nvl(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi_exists",
    tags=("J3",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' AND o.o_totalprice > 200000
        )
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → LEFT SEMI join: probe side streams, no row multiplication,
    build side reduced to distinct keys before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_not_exists",
    tags=("J3",),
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → LEFT ANTI join (customers with no urgent order — the
    unfiltered variant is degenerate on the fixtures: every customer has
    at least one order at sf≥0.01)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_cross",
    tags=("J4",),
    oracle="""
        SELECT r.r_name, s.status, COUNT(*) AS n_pairs
        FROM region r
        CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
        GROUP BY r.r_name, s.status
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN — only ever sane when at least one side is tiny; both
    sides here are ≤5 rows and Spark broadcasts the smaller one."""
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(s).groupBy("r_name", "status").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "join_theta_range",
    tags=("J5",),
    oracle="""
        SELECT c.c_custkey, s.s_suppkey
        FROM customer c
        JOIN supplier s
          ON c.c_nationkey = s.s_nationkey
         AND s.s_acctbal > c.c_acctbal
         AND c.c_acctbal > 9000
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nationkey) + non-equi residual (balance range).

    Scale: because one conjunct is an equality, Catalyst still plans a
    hash join on nationkey and evaluates the range predicate as a
    post-join filter — no nested-loop blowup. A pure non-equi join would
    fall back to BroadcastNestedLoop and should be avoided on two large
    inputs (document: pre-bucket one side or band-discretize the range).
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))  # dim side: module policy
    return c.join(
        s, (c.c_nationkey == s.s_nationkey) & (s.s_acctbal > c.c_acctbal), "inner"
    ).select("c_custkey", "s_suppkey")


@register(
    "join_star_revenue",
    tags=("J7", "J6", "A1"),
    bench=True,
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * ({_ONE} - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way star join (J7): revenue per nation for one
    region-year.

    Scale: the two fact tables join on l_orderkey (shuffle), every dim is
    broadcast, and the region filter prunes before the join via the
    broadcast build side. AQE reorders/coalesces at runtime; with CBO
    stats Catalyst would also reorder the dim chain — at fixture scale the
    written order is already smallest-first.

    100 TB layout (ADOPTED, measured r4 — tools/star_join_ab.py,
    BASELINE.md): store lineitem+orders DISTKEY-bucketed AND sorted on
    the order key (write_bucketed_table). The co-located SortMergeJoin
    then skips the fact shuffle entirely: at sf10 this measured 1.67×
    (3.57→2.14 s, shuffle exchanges 6→2, results bit-identical), and the
    one-time bucketing cost amortizes at ingest. This builder keeps the
    portable raw-fixture plan because the driver benches raw fixtures;
    eager pre-join aggregation was measured-and-REJECTED (2× slower at
    sf10, BASELINE.md r3 item 4).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    one = one_rate()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "join_asof_last_view",
    tags=("J8", "W2"),
    oracle="""
        SELECT user_id, event_id, ts, last_view_ts
        FROM (
            SELECT user_id, event_id, ts, event_type,
                   MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_view_ts
            FROM events
            WHERE event_type IN ('view', 'purchase')
        )
        WHERE event_type = 'purchase'
    """,
)
def join_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J8): for each purchase, the latest view by the same user
    at-or-before it — expressed as a running conditional MAX window instead
    of a per-row range join.

    Scale: one shuffle on user_id + per-partition sort; contrast with the
    naive range-join formulation which is O(events²) per user. This is the
    canonical Spark re-expression of an as-of/LATERAL pattern.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("last_view_ts", F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "last_view_ts")
    )
