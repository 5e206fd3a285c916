"""Core relational operators: scan, project, filter, CASE, DISTINCT,
sort/limit/top-k, set ops, and the ETL staging chain (SURVEY.md §2.1-§2.2,
§2.6 — rows S1, S6, F1-F5, O1-O5).

Scale notes that apply to everything in this module:
- Builders are fully declarative → Catalyst pushes filters and prunes
  columns into the parquet scan (verified via .explain: PushedFilters /
  ReadSchema), so a 100 TB scan reads only referenced columns/row groups.
- Global ORDER BY ... LIMIT k plans as TakeOrderedAndProject (per-partition
  top-k + driver merge) — no full sort shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.functions.dialect import (
    dec,
    decode,
    money,
    nvl,
    one_rate,
    rate,
)
from sql_redshift_etl_spark.plans.registry import register


@register(
    "flagship_pricing_summary",
    tags=("S1", "F1", "F2", "F4", "A1", "A9", "O1"),
    bench=True,
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
                AS sum_disc_price,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                     * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
                AS sum_charge,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query.

    One scan → map-side partial agg → 6-group final agg: the shuffle moves
    only (flag,status,partials), a few KB regardless of input size, so the
    plan is scan-bound and embarrassingly parallel at 100 TB.

    Decimal widths are domain-narrow (dialect.money/rate): disc_price is
    (8,2)×(4,2)→(13,4) and charge (13,4)×(4,2)→(18,6) — every product
    fits precision 18, so whole-stage codegen sums longs, not BigDecimal.
    The oracle keeps its (18,2) casts: exact arithmetic at either width
    yields the same rationals, hence identical doubles (verified).

    The scale-4/6 sums are ROUNDed to 2 dp (still exact decimal math,
    identical in both engines) BEFORE the double cast: a scale-6 sum
    crosses 2^53 around 9e9 in value (hit at sf1 — engines then round
    the cast differently in the last ulp), while the 2-dp presentation
    stays integer-exact in a double up to ~4.5e13.
    """
    one = one_rate()
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (one - rate("l_discount"))
    qty = dec("l_quantity", 2, 4)
    return bounded_sort(
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (one + rate("l_tax"))), 2).cast("double").alias(
                "sum_charge"
            ),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(rate("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ),
        # returnflag×linestatus is a ≤6-row bounded domain at ANY scale;
        # see catalog.bounded_sort for the rangepartitioning rationale.
        "l_returnflag",
        "l_linestatus",
    )


@register(
    "scan_project_expr",
    tags=("F1", "F2", "F4"),
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
            EXTRACT(year FROM l_shipdate) AS ship_year
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def scan_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed expressions + pushed-down conjunctive filter
    (TPC-H Q6's scan shape). Both predicates reach the parquet scan as
    PushedFilters; only 5 of 11 lineitem columns are read (ReadSchema).
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = one_rate()
    return li.where(F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)).select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
    )


@register(
    "filter_predicates",
    tags=("F2",),
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE (o_orderpriority LIKE '1%' OR o_orderstatus = 'F')
          AND o_totalprice > 150000
          AND o_orderpriority IS NOT NULL
          AND o_orderstatus IN ('F', 'O')
          AND NOT (o_orderpriority ILIKE '%not specified%')
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: LIKE / ILIKE / IN / IS NOT NULL / AND-OR-NOT."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderpriority").like("1%") | (F.col("o_orderstatus") == "F"))
        & (F.col("o_totalprice") > 150000)
        & F.col("o_orderpriority").isNotNull()
        & F.col("o_orderstatus").isin("F", "O")
        & ~F.col("o_orderpriority").ilike("%not specified%")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "case_when_decode",
    tags=("F3",),
    oracle="""
        SELECT
            o_orderkey,
            CASE WHEN o_totalprice >= 300000 THEN 'high'
                 WHEN o_totalprice >= 100000 THEN 'mid'
                 ELSE 'low' END AS price_band,
            CASE o_orderstatus WHEN 'F' THEN 'finished'
                               WHEN 'O' THEN 'open'
                               WHEN 'P' THEN 'pending'
                               ELSE 'unknown' END AS status_label,
            COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending
        FROM orders
    """,
)
def case_when_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / DECODE / NULLIF / COALESCE(NVL) — Redshift conditional
    expressions (SURVEY §2.2 F3). DECODE maps to a chained when/otherwise."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        decode(
            "o_orderstatus",
            ("F", F.lit("finished")),
            ("O", F.lit("open")),
            ("P", F.lit("pending")),
            default=F.lit("unknown"),
        ).alias("status_label"),
        nvl(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias("status_or_pending"),
    )


@register(
    "distinct_projection",
    tags=("F5",),
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash-aggregate shuffle on the projected keys only.

    Scale: partial-distinct runs map-side first, so the shuffle carries
    |distinct| rows, not |input| rows.
    """
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "cast_conversions",
    tags=("F4",),
    oracle="""
        SELECT
            o_orderkey,
            CAST(o_orderkey AS VARCHAR) AS key_str,
            STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
            CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
            CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
        FROM orders
        WHERE o_orderkey <= 1000
    """,
)
def cast_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / :: conversion surface. Deliberately avoids bare double→int
    casts (Spark truncates, Redshift/DuckDB round — a dialect trap; use
    explicit FLOOR/CEIL/ROUND instead, as this builder does)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        # DATE rendered as string: Spark DateType → datetime.date while
        # DuckDB DATE → datetime64 in pandas; strings compare cleanly.
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        dec("o_totalprice").cast("string").alias("price_str"),
    )


@register(
    "union_all_accounts",
    tags=("O4",),
    oracle="""
        SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS side FROM supplier
    """,
)
def union_all_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — zero-shuffle concatenation (Spark Union keeps both
    children's partitioning; no exchange in the plan)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "union_distinct_nations",
    tags=("O4",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup) = unionByName + distinct."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "intersect_nations",
    tags=("O5",),
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_nations",
    tags=("O5",),
    oracle="""
        SELECT DISTINCT l_orderkey AS orderkey FROM lineitem WHERE l_quantity >= 30
        EXCEPT
        SELECT o_orderkey AS orderkey FROM orders WHERE o_totalprice > 300000
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / MINUS (set semantics): high-quantity orders that are not
    high-value — non-degenerate (non-empty) at every fixture sf.

    Naming note: the set-op runs over ORDER KEYS, not nations — the
    registered name is historical (r1) and is load-bearing in
    _VERIFY_FIRST / driver CORRECTNESS rows, so it stays stable."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 30)
        .select(F.col("l_orderkey").alias("orderkey"))
        .distinct()
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("orderkey"))
    )
    return li.subtract(o)  # subtract == EXCEPT (set semantics)


@register(
    "orderby_limit_offset",
    tags=("O1", "O2"),
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20 OFFSET 10
    """,
)
def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY multi-key + LIMIT/OFFSET. The sort key includes the unique
    o_orderkey as tiebreak so the selected window is deterministic (and
    therefore oracle-stable)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(20)
    )


@register(
    "topk_global_revenue",
    tags=("O3",),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 10
    """,
)
def topk_global_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject — each partition keeps
    its local k, driver merges k·p rows. No full sort at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    one = one_rate()
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            (money("l_extendedprice") * (one - rate("l_discount"))).cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(10)
    )


@register(
    "ctas_staging_chain",
    tags=("S6",),
    oracle="""
        WITH staging_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_orderstatus = 'F'
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(s.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        FROM staging_orders s
        JOIN customer c ON s.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
)
def ctas_staging_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS / INSERT INTO ... SELECT staging chain (S6) — the
    core Redshift ETL idiom: staging view → transform → publish.

    Spark-first: the "staging table" is a temp view, so Catalyst sees
    through it and optimizes the *whole* chain as one plan (filter pushed
    below the join; no materialization barrier — unlike warehouse CTAS).
    """
    load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).createOrReplaceTempView("ctas_staging_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("ctas_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(s.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        FROM ctas_staging_orders s
        JOIN ctas_customer c ON s.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )
