"""Queries executed through the Redshift-SQL front-end — the literal
workflow of a reference user: paste the Redshift script, run on Spark,
verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.redshift_sql import run_redshift_sql
from sql_redshift_etl_spark.plans.registry import register

# Verbatim Redshift-dialect script (DATEDIFF boundary semantics, TO_CHAR
# format dialect, NVL, DECODE, ILIKE — all as a Redshift user writes them).
_REDSHIFT_REPORT = """
    SELECT o_orderkey,
           TO_CHAR(o_orderdate, 'YYYY-MM-DD') AS order_day,
           DATEDIFF(year, o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS years_to_y2k,
           DATEDIFF(day, o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           NVL(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           DECODE(o_orderpriority, '1-URGENT', 1, '2-HIGH', 2, 9) AS priority_rank
    FROM {orders}
    WHERE o_orderpriority ILIKE '%high%' OR o_orderpriority LIKE '1%'
"""

_REDSHIFT_EVENTS = """
    SELECT user_id,
           LISTAGG(event_type, ',') WITHIN GROUP (ORDER BY event_type) AS event_types,
           MAX(JSON_EXTRACT_PATH_TEXT(props, 'k')) AS max_k_str
    FROM {events}
    WHERE event_id < 2000
    GROUP BY user_id
"""


@register(
    "redshift_sql_report",
    tags=("F1", "F3", "S6"),
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               date_diff('year', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS years_to_y2k,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
               CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS priority_rank
        FROM orders
        WHERE o_orderpriority ILIKE '%high%' OR o_orderpriority LIKE '1%'
    """,
)
def redshift_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A verbatim Redshift-dialect report script executed through the
    dialect front-end (functions.redshift_sql): DATEDIFF boundary
    semantics, TO_CHAR formats, NVL/DECODE/ILIKE. The oracle re-expresses
    the same report in DuckDB's own dialect — three dialects, one result."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rs_orders")
    return run_redshift_sql(spark, _REDSHIFT_REPORT.format(orders="rs_orders"))


@register(
    "redshift_sql_events",
    tags=("F1", "A5"),
    oracle="""
        SELECT user_id,
               STRING_AGG(event_type, ',' ORDER BY event_type) AS event_types,
               MAX(json_extract_string(props, '$.k')) AS max_k_str
        FROM events
        WHERE event_id < 2000
        GROUP BY user_id
    """,
)
def redshift_sql_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redshift LISTAGG + JSON_EXTRACT_PATH_TEXT script through the
    dialect front-end, grouped per user."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("rs_events")
    return run_redshift_sql(spark, _REDSHIFT_EVENTS.format(events="rs_events"))
