"""Window extensions: RANGE (value-based) frames and IGNORE NULLS —
the remaining W3/W4 sub-features of SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.plans.registry import register


@register(
    "window_range_frame",
    tags=("W4",),
    oracle="""
        SELECT s_suppkey, s_nationkey, s_acctbal,
               COUNT(*) OVER (
                   PARTITION BY s_nationkey ORDER BY s_acctbal
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
               ) AS n_within_1000,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (
                   PARTITION BY s_nationkey ORDER BY s_acctbal
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS bal_within_1000
        FROM supplier
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame (W4): per nation, suppliers whose
    balance is within 1000 below the current row's — value frames need
    no tiebreak because peers (equal sort values) share one frame, which
    is exactly what makes them deterministic under ties (unlike ROWS)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal").rangeBetween(-1000, Window.currentRow)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_1000"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).over(w).cast("double").alias("bal_within_1000"),
    )


@register(
    "window_ignore_nulls",
    tags=("W2", "W3"),
    oracle="""
        SELECT user_id, event_id,
               LAG(purchase_value IGNORE NULLS) OVER w AS prev_purchase_value,
               FIRST_VALUE(purchase_value IGNORE NULLS) OVER w AS first_purchase_value
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
            FROM events
        )
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / FIRST_VALUE with IGNORE NULLS (W2/W3): carry the last/first
    *purchase* value across interleaved non-purchase events — the
    Redshift idiom for last-known-good propagation."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "purchase_value", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    order = [F.col("ts"), F.col("event_id")]
    w_grow = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Redshift LAG ... IGNORE NULLS == last non-null strictly BEFORE the
    # current row; Spark expresses it as last(ignorenulls) over the frame
    # ending one row back.
    w_before = (
        Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last("purchase_value", ignorenulls=True).over(w_before).alias("prev_purchase_value"),
        F.first_value("purchase_value", ignoreNulls=True).over(w_grow).alias("first_purchase_value"),
    )
