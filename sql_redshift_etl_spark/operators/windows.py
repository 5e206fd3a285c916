"""Window-function operators (SURVEY.md §2.5, rows W1-W6).

Scale notes:
- A window = one shuffle on partitionBy keys + per-partition sort. All
  windows in one query share the shuffle when their partitioning matches
  — builders here reuse one (user/customer) partitioning per query.
- Every ORDER BY includes a unique tiebreak column: rank ties are the
  #1 source of nondeterministic (→ oracle-failing, and at scale
  rerun-unstable) window results.
- Skew: a single giant partition key serializes; for 100 TB the events
  windows key on user_id (high cardinality). Never window over a
  constant/low-cardinality key without a pre-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dec
from sql_redshift_etl_spark.plans.registry import register


@register(
    "window_ranks",
    tags=("W1",),
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ROW_NUMBER()  OVER w AS rn,
               RANK()        OVER w AS rnk,
               DENSE_RANK()  OVER w AS drnk,
               NTILE(4)      OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
               ROUND(CUME_DIST()    OVER w, 8) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER/RANK/DENSE_RANK/NTILE/PERCENT_RANK/CUME_DIST (W1) over
    one shared window spec — single shuffle+sort serves all six."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )


@register(
    "window_lag_lead",
    tags=("W2",),
    oracle="""
        SELECT user_id, event_id, ts,
               LAG(ts) OVER w AS prev_ts,
               LEAD(event_type, 1, 'none') OVER w AS next_type,
               date_diff('second', LAG(ts) OVER w, ts) AS gap_seconds
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with offset + default (W2); gap computed in whole seconds
    of boundary crossings (Redshift DATEDIFF semantics — matches DuckDB
    date_diff('second'))."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("gap_seconds"),
    )


@register(
    "window_first_last",
    tags=("W3",),
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice)  OVER w AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE (W3) with the full-partition frame
    — the default growing frame makes LAST_VALUE ≡ current row, the
    classic Redshift gotcha, so the frame is explicit."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.last_value("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_moving_agg",
    tags=("W4",),
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS moving_avg,
               COUNT(*) OVER w AS frame_n
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregates over ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    (W4) — exact-decimal inside the frame keeps sums oracle-identical."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-3, Window.currentRow)
    msum = F.sum(dec("o_totalprice")).over(w).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        msum.alias("moving_sum"),
        (msum / F.count(F.lit(1)).over(w)).alias("moving_avg"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@register(
    "window_running_total",
    tags=("W5",),
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue
        FROM lineitem
        WHERE l_suppkey <= 10
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total (W5). ORDER BY includes (orderkey, linenumber) after
    shipdate: with a ROWS frame, ties in the sort key would otherwise make
    the cumulative sum nondeterministic."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_extendedprice")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "window_topk_per_group",
    tags=("W6",),
    bench=True,
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ROW_NUMBER ≤ k (W6) — the canonical Redshift
    ETL dedup/top-k idiom.

    Scale: Spark ≥3.5 plans a WindowGroupLimit (rank pushdown): each map
    task keeps only k rows per group before the shuffle, so the exchange
    carries ≈ k·groups rows instead of the full table.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn"))
        .where(F.col("rn") <= 3)
    )
