"""Registered streaming queries: each runs a Structured Streaming
pipeline to completion (availableNow trigger → memory sink) and returns
the final table, so the driver's batch-shaped contract can check
streaming results. The tumbling aggregation has a full SQL oracle —
streaming and batch semantics coincide on a closed input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.plans.registry import register
from sql_redshift_etl_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory,
    stateful_session_counts,
    tumbling_daily_counts,
    tumbling_with_watermark,
)


@register(
    "stream_tumbling_daily",
    tags=("E1", "E5"),
    oracle="""
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY day, event_type
    """,
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation (E1), run to
    completion with trigger(availableNow) into a memory sink. On a closed
    input, complete-mode streaming output ≡ the batch aggregation — the
    oracle checks exactly that batch/stream parity."""
    agg = tumbling_daily_counts(read_events_stream(spark, sf_dir))
    run_to_memory(agg, "stream_tumbling_daily_sink", "complete")
    return spark.table("stream_tumbling_daily_sink")


@register("stream_tumbling_watermark", tags=("E5",))  # rows-only: emitted set depends on watermark advance
def stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode variant (E5): only windows closed by the
    final watermark are emitted — the late-data/state-eviction contract.
    Emitted set depends on micro-batch watermark progression → rows-only
    for the driver; pytest asserts it's a subset of the complete-mode
    result."""
    agg = tumbling_with_watermark(read_events_stream(spark, sf_dir))
    run_to_memory(agg, "stream_tumbling_wm_sink", "append")
    return spark.table("stream_tumbling_wm_sink")


@register("stream_stateful_sessions", tags=("E3", "E5"))  # rows-only: custom stateful operator
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user event/session counters maintained in state across
    micro-batches. The non-SQL-expressible streaming surface (SURVEY
    §2.10) — rows-only; pytest asserts totals against batch."""
    out = stateful_session_counts(read_events_stream(spark, sf_dir))
    run_to_memory(out, "stream_sessions_sink", "update")
    return spark.table("stream_sessions_sink")


@register(
    "stream_dedup_exactly_once",
    tags=("E5", "L1"),
    oracle="""
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
)
def stream_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (exactly-once ingestion): the stream carries
    re-delivered duplicates (every 10th event appears twice); streaming
    dropDuplicates on event_id must restore exactly the source relation —
    the oracle is the plain batch aggregation over the ORIGINAL events
    table, so any surviving duplicate or dropped event hash-mismatches."""
    from sql_redshift_etl_spark.streaming.pipeline import deduplicated_events

    dedup = deduplicated_events(read_events_stream(spark, sf_dir))
    run_to_memory(dedup, "stream_dedup_sink", "append")
    return (
        spark.table("stream_dedup_sink")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
