"""Time-series / stream-shaped operators over the events table
(SURVEY.md §2.8, rows E1-E6) — batch semantics here; the streaming
variants live in sql_redshift_etl_spark.streaming.

Scale notes:
- Tumbling/sliding aggregations group on (window, user) — shuffle volume
  is bounded by distinct windows × users, not events.
- Sessionization is one shuffle on user_id + per-user sort (the lag →
  flag → running-sum pattern); at 100 TB this is the standard formulation
  and skew only matters for pathological single users (AQE splits those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dsum
from sql_redshift_etl_spark.plans.registry import register


@register(
    "events_tumbling_daily",
    tags=("E1",),
    bench=True,
    oracle="""
        SELECT date_trunc('day', ts) AS day,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY day, event_type
    """,
)
def events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily window aggregation (E1), date_trunc form."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2, 8).alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "events_tumbling_hourly_window",
    tags=("E1",),
    oracle="""
        SELECT date_trunc('hour', ts) AS win_start,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY win_start
    """,
)
def events_tumbling_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window via Spark's native F.window (E1) — the same
    construct the Structured Streaming variant uses, proving batch/stream
    operator parity. window.start ≡ date_trunc for epoch-aligned windows
    (session tz pinned UTC)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(F.col("window.start").alias("win_start"), "n_events", "n_users")
    )


@register(
    "events_sliding_window",
    tags=("E2",),
    oracle="""
        SELECT win_start, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM (
            SELECT date_trunc('day', ts) - (o.off * INTERVAL '1 day') AS win_start, value
            FROM events
            CROSS JOIN (VALUES (0), (1)) AS o(off)
        )
        GROUP BY win_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 2d long / 1d slide (E2) via F.window. Each event
    lands in exactly length/slide windows; the oracle reproduces that by
    exploding each event into its 2 member windows (UNION-ALL form)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2, 8).alias("total_value"))
        .select(F.col("window.start").alias("win_start"), "n_events", "total_value")
    )


@register(
    "events_sessionize",
    tags=("E3",),
    bench=True,
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (E3), batch form: lag → new-session flag →
    running sum as session id → per-session aggregate.

    The gap test is ``>= 30 minutes`` (new session at exactly the gap) to
    match F.session_window's half-open [ts, ts+gap) semantics, so the
    batch, SQL-oracle, and streaming formulations all agree.
    """
    ev = load_table(spark, sf_dir, "events")
    # event_id tiebreak: duplicate (user, ts) pairs exist at sf0.1 — an
    # untied ORDER BY makes the running session-id nondeterministic.
    # wrun DERIVES from w so the correctness-critical ordering lives in
    # exactly one place.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Microsecond-precise gap: casting timestamps to long truncates to
    # whole seconds, which flips sessions whose true gap straddles the
    # 30-min boundary within a second (bit us at sf0.1). timestampdiff
    # (not unix_micros) because it accepts TIMESTAMP_NTZ too — the
    # driver's vanilla session reads the NANOS fixture as NTZ, and
    # unix_micros rejects that type outright.
    flagged = (
        ev.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("_prev_ts").isNull()
                | (F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)") >= 30 * 60 * 1_000_000),
                1,
            ).otherwise(0),
        )
        .drop("_prev_ts")
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(wrun))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2, 8).alias("session_value"),
    )


@register(
    "events_session_window_native",
    tags=("E3",),
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's native F.session_window (E3) — the exact
    operator the streaming pipeline uses, oracle-checked against the
    window-function formulation to prove the two semantics coincide."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "events_funnel",
    tags=("E4",),
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'signup')   AS first_signup,
                   MIN(ts) FILTER (WHERE event_type = 'view')     AS first_view,
                   MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT
            COUNT(*) AS n_users,
            COUNT(first_signup) AS n_signup,
            COUNT(CASE WHEN first_view > first_signup THEN 1 END) AS n_signup_then_view,
            COUNT(CASE WHEN first_view > first_signup AND first_purchase > first_view THEN 1 END)
                AS n_full_funnel
        FROM per_user
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel (E4): signup → view → purchase conversion
    counts, one pass via conditional MIN per user then ordering checks."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signup"),
        F.count(F.when(F.col("first_view") > F.col("first_signup"), 1)).alias("n_signup_then_view"),
        F.count(
            F.when(
                (F.col("first_view") > F.col("first_signup"))
                & (F.col("first_purchase") > F.col("first_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "events_incremental_load",
    tags=("E6",),
    oracle="""
        SELECT event_type, COUNT(*) AS n_new,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS new_value
        FROM events
        WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY event_type
    """,
)
def events_incremental_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental load (E6) — the core ETL idiom: process
    only rows past the last-run watermark, then append.

    Scale: with date-partitioned storage this predicate becomes partition
    pruning (zero I/O for already-loaded days) — see sources.writers for
    the partitioned writer that makes that true.
    """
    watermark = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events").where(F.col("ts") > watermark)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_new"),
        dsum("value", 2, 8).alias("new_value"),
    )


@register(
    "events_gap_fill_locf",
    tags=("E1", "W3"),
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', MIN(ts)) AS d0,
                   date_trunc('day', MAX(ts)) AS d1
            FROM events
        ), days AS (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   COUNT(*) AS n_big,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS big_total
            FROM events WHERE value > 300 GROUP BY 1, 2
        )
        SELECT t.event_type, s.day,
               COALESCE(d.n_big, 0) AS n_big,
               d.big_total,
               last_value(d.big_total IGNORE NULLS) OVER (
                   PARTITION BY t.event_type ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_total,
               CASE WHEN d.big_total IS NULL THEN 1 ELSE 0 END AS is_gap
        FROM types t
        CROSS JOIN days s
        LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling with LOCF (last observation carried
    forward) — the canonical time-series densification idiom: build the
    complete (event_type × day) spine from the table's own bounds
    (F.sequence + explode, Spark's generate_series), left-join the
    sparse daily rollup (value > 300 keeps ~15% of cells occupied, so
    the fill is load-bearing), and carry the last non-null total
    forward with last(ignorenulls) over an unbounded-preceding frame.

    Scale: the spine is |types| × |days| — tiny relative to the fact
    table at any sf, built from a 1-row bounds aggregate and broadcast
    into the join; the rollup is one partial-agg shuffle; LOCF
    partitions by type over the spine (bounded frame, single window
    pass). Nothing here grows faster than the spine itself.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    daily = (
        ev.filter(F.col("value") > 300)
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_big"), dsum("value", 2, 8).alias("big_total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
        "big_total",
        F.last("big_total", ignorenulls=True).over(w).alias("locf_total"),
        F.when(F.col("big_total").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )
