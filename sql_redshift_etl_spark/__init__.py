"""sql_redshift_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the ``William-Robert/sql-redshift-etl`` reference (a
Redshift-dialect SQL ETL pipeline; see SURVEY.md §0 for the
reference-availability caveat), plus the LLM-training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design: a library of DataFrame builders over Catalyst — no custom parser,
optimizer, or shuffle. Every operator is declarative (DataFrame / Spark SQL)
so predicate pushdown, column pruning, join selection, AQE and whole-stage
codegen apply for free; Python UDFs appear only where semantics genuinely
require them (and then only Arrow-batched Pandas UDFs).
"""

from sql_redshift_etl_spark.session import get_spark
from sql_redshift_etl_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
