"""Structured Streaming pipelines over the events stream (SURVEY.md
§2.8 E1/E3/E5 streaming variants).

The same logical operators as operators.events, expressed over
readStream — batch/stream parity is the design point: window(),
session_window(), and the aggregation expressions are shared idioms, so
an ETL can promote a batch job to incremental streaming without
rewriting semantics.

Scale notes:
- File-source streaming at 100 TB: maxFilesPerTrigger bounds each
  micro-batch; state store (RocksDB in prod conf) holds window/session
  state keyed by (window, user) — watermarks bound its growth.
- availableNow trigger = incremental batch: process everything pending,
  checkpoint, stop — the Redshift scheduled-COPY analog.
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sql_redshift_etl_spark.session import apply_runtime_confs

# Physical schema of events.parquet as Spark reads it under nanosAsLong
# (ts arrives as bigint nanoseconds; normalized in the stream below).
EVENTS_RAW_SCHEMA = "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (schema must be explicit —
    streaming sources never infer)."""
    apply_runtime_confs(spark)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_daily_counts(stream: DataFrame) -> DataFrame:
    """Streaming tumbling-window aggregation (E1) — same expressions as
    the batch events_tumbling_daily."""
    return (
        stream.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("window.start").alias("day"), "event_type", "n_events", "total_value")
    )


def tumbling_with_watermark(stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Watermarked variant (E5): late data beyond `delay` is dropped and
    window state is evicted once the watermark passes — the knob that
    bounds state at 100 TB/day event volumes."""
    return (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("day"), "event_type", "n_events")
    )


def run_to_memory(agg: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Execute a streaming aggregation to completion (availableNow) into
    an in-memory sink table `name`."""
    spark = agg.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def _count_sessions(pdf: pd.DataFrame, gap_seconds: int = 1800) -> tuple[int, int]:
    ts = pdf["ts"].sort_values()
    gaps = ts.diff().dt.total_seconds()
    return len(pdf), int(1 + (gaps >= gap_seconds).sum())


def user_session_stats_stateful(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState UDF: per-user running (n_events, n_sessions)
    across micro-batches — the custom-stateful-operator surface (E3/E5).
    State schema: (n_events BIGINT, n_sessions BIGINT)."""
    prev_events, prev_sessions = state.get if state.exists else (0, 0)
    n_events, n_sessions = 0, 0
    for pdf in batches:
        e, s = _count_sessions(pdf)
        n_events += e
        n_sessions += s
    state.update((prev_events + n_events, prev_sessions + n_sessions))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [prev_events + n_events],
            "n_sessions": [prev_sessions + n_sessions],
        }
    )


def stateful_session_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState."""
    return stream.groupBy("user_id").applyInPandasWithState(
        user_session_stats_stateful,
        outputStructType="user_id BIGINT, n_events BIGINT, n_sessions BIGINT",
        stateStructType="n_events BIGINT, n_sessions BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
