"""UDF / UDAF / UDTF surface (SURVEY.md §2.10) — the Redshift scalar
Python UDF / lambda UDF analog, done the Spark-performant way.

Engine rule (SURVEY §2.10): built-in expressions everywhere Catalyst can
see; Python only behind Arrow batching. Hierarchy demonstrated here:
- pandas_udf scalar     → vectorized scalar UDF (Arrow columns in/out)
- pandas_udf agg        → grouped-agg UDAF
- UDTF (@udtf)          → table function (one row in → many rows out)
Row-at-a-time @udf is deliberately absent — it is never the right call
in this engine (10-100× slower than the Arrow forms).

UDF objects are created inside the builders: pandas_udf registration
needs an active SparkSession, and builders are the only context
guaranteed to have one (the driver hands us its session).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.plans.registry import register


def _log_quality_fn(n_chars: pd.Series, n_words: pd.Series) -> pd.Series:
    """Vectorized scalar kernel: log-scaled density score (numpy on Arrow
    batches — zero Python-per-row cost)."""
    return pd.Series(np.round(np.log1p(n_chars.to_numpy()) / np.log1p(n_words.to_numpy()), 6))


@register(
    "udf_pandas_scalar_score",
    tags=("UDF",),
    oracle="""
        SELECT doc_id,
               ROUND(LN(1 + n_chars) / LN(1 + len(string_split(text, ' '))), 6) AS density_score
        FROM documents
        WHERE doc_id < 200
    """,
)
def udf_pandas_scalar_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (§2.10): the Redshift python-UDF analog. The
    same math is SQL-expressible, so the oracle re-expresses it in pure
    SQL — proving the UDF computes what it claims (numpy log1p and SQL
    LN(1+x) agree to well under the 6-dp rounding)."""
    log_quality = pandas_udf(_log_quality_fn, "double")
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        log_quality(F.col("n_chars"), F.size(F.split("text", " "))).alias("density_score"),
    )


def _weighted_mean_fn(value: pd.Series, weight: pd.Series) -> float:  # returns None on all-null groups (SQL NULL); bare float annotation lets pandas_udf infer GROUPED_AGG
    # SQL-aggregate NULL semantics, matched on purpose: rows with a NULL
    # weight OR a NULL value are SKIPPED (a NaN would otherwise poison
    # the group), and an all-null/zero weight sum yields NULL. The
    # oracle's denominator uses the SAME mask — SUM(CASE WHEN value IS
    # NOT NULL THEN w END) — so both sides agree by construction even if
    # a row has non-null weight and null value.
    mask = weight.notna() & value.notna()
    w = weight[mask].to_numpy(dtype=np.float64)
    v = value[mask].to_numpy(dtype=np.float64)
    total = w.sum()
    return float(np.round(np.dot(v, w) / total, 6)) if total else None


@register(
    "udaf_weighted_mean",
    tags=("UDF",),
    oracle="""
        SELECT event_type,
               ROUND(SUM(value * CAST(json_extract_string(props, '$.k') AS DOUBLE))
                     / NULLIF(SUM(CASE WHEN value IS NOT NULL
                                       THEN CAST(json_extract_string(props, '$.k') AS DOUBLE) END), 0),
                     6) AS weighted_value
        FROM events
        GROUP BY event_type
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (UDAF, §2.10): per-event-type mean of
    value weighted by the JSON props.k field. SQL-oracled via the A4
    pattern (aggregates.py:104): both engines round to 6 dp, which
    absorbs the last-bit float reduction-order difference between
    numpy's dot product and DuckDB's streaming SUM."""
    # Type-hint inference selects GROUPED_AGG from the scalar return
    # annotation — no magic functionType constant, no deprecation warning.
    weighted_mean = pandas_udf(_weighted_mean_fn, "double")
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        ev.select("event_type", F.col("value"), k.alias("k"))
        .groupBy("event_type")
        .agg(weighted_mean("value", "k").alias("weighted_value"))
    )


@register(
    "udtf_chunk_documents",
    tags=("UDF", "L4"),
    oracle="""
        SELECT doc_id,
               CAST(chunk_idx AS INTEGER) AS chunk_idx,
               array_to_string(words[(chunk_idx * 32 + 1):(chunk_idx * 32 + 32)], ' ') AS chunk,
               CAST(LEAST(32, len(words) - chunk_idx * 32) AS INTEGER) AS n_tokens
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(0, CAST(ceil(len(string_split(text, ' ')) / 32.0) AS BIGINT) - 1)) AS chunk_idx
            FROM documents
            WHERE doc_id < 100
        )
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.10): table function exploding each document into
    32-token chunks — the pre-tokenization sharding step of an LLM data
    pipeline. The chunking is also SQL-expressible, so the oracle checks
    the UDTF end-to-end (ids, boundaries, remainders)."""

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
    class ChunkDocument:
        CHUNK = 32

        def eval(self, doc_id: int, text: str):
            words = text.split(" ")
            for i in range(0, len(words), self.CHUNK):
                chunk = words[i : i + self.CHUNK]
                yield doc_id, i // self.CHUNK, " ".join(chunk), len(chunk)

    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "udtf_docs"
    )
    spark.udtf.register("chunk_document", ChunkDocument)
    return spark.sql("SELECT c.* FROM udtf_docs, LATERAL chunk_document(doc_id, text) AS c")
