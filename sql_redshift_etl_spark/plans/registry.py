"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here as a named builder
``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) a matching
DuckDB oracle SQL string. The driver hash-compares the two at sf0.01, so
builders and oracles must agree on column NAMES (alias everything) and on
VALUES bit-for-bit (see functions.dialect for the exact-decimal rules).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()  # SURVEY §2 row ids, e.g. ("A1", "J7")
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Modules whose import populates the registry (decorator side effect).
_QUERY_MODULES = [
    "sql_redshift_etl_spark.operators.core",
    "sql_redshift_etl_spark.operators.joins",
    "sql_redshift_etl_spark.operators.aggregates",
    "sql_redshift_etl_spark.operators.windows",
    "sql_redshift_etl_spark.operators.events",
    "sql_redshift_etl_spark.operators.tpch",
    "sql_redshift_etl_spark.operators.subqueries",
    "sql_redshift_etl_spark.operators.pipelines",
    "sql_redshift_etl_spark.operators.windows_extra",
    "sql_redshift_etl_spark.functions.scalars",
    "sql_redshift_etl_spark.functions.udfs",
    "sql_redshift_etl_spark.functions.redshift_queries",
    "sql_redshift_etl_spark.llm.ml_lsh",
    "sql_redshift_etl_spark.llm.text",
    "sql_redshift_etl_spark.llm.dedup",
    "sql_redshift_etl_spark.llm.similarity",
    "sql_redshift_etl_spark.llm.multimodal",
    "sql_redshift_etl_spark.sources.queries",
    "sql_redshift_etl_spark.streaming.queries",
]


def register(
    name: str,
    *,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, bench, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip, don't break
            # the whole registry. Missing *third-party* deps should be
            # handled inside the module itself.
            if e.name and e.name.startswith("sql_redshift_etl_spark"):
                continue
            raise


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def query_fns() -> dict[str, Builder]:
    return {name: q.builder for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
