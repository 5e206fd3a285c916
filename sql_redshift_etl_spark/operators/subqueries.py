"""Subquery forms (SURVEY.md §3.2 SQL path / §4 decorrelation):
scalar, correlated, and IN-subqueries through spark.sql — Catalyst's
RewriteCorrelatedScalarSubquery / exists-to-semi-join rules do the
heavy lifting; we deliberately do NOT pre-flatten (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.plans.registry import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")


@register(
    "subquery_scalar_uncorrelated",
    tags=("F2", "A1"),
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                         / COUNT(*) FROM orders)
    """,
)
def subquery_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 1.5× the global average (2× is empty on the fixture distribution).
    Catalyst evaluates the subquery once (SubqueryExec, broadcast as a
    literal) — one extra tiny job, no per-row cost."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM sq_orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                         / COUNT(*) FROM sq_orders)
        """
    )


@register(
    "subquery_correlated_scalar",
    tags=("F2", "A1", "J1"),
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance. Catalyst decorrelates it into an aggregate + join
    (RewriteCorrelatedScalarSubquery) — written naively, executed as the
    efficient two-pass plan; never a per-row re-execution."""
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM sq_customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*)
                           FROM sq_customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "subquery_in_filter",
    tags=("J3", "F2"),
    oracle="""
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
          AND p_size > 20
    """,
)
def subquery_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: parts that ever shipped in bulk. Catalyst rewrites
    IN (SELECT ...) to a left-semi join — same plan as join_semi_exists,
    reached from the SQL-string path."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM sq_part
        WHERE p_partkey IN (SELECT l_partkey FROM sq_lineitem WHERE l_quantity >= 45)
          AND p_size > 20
        """
    )
