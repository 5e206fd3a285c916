"""Streaming-specific invariants beyond the driver's rows-only checks."""

from __future__ import annotations

from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_watermark_append_is_subset_of_complete(spark):
    complete = QUERIES["stream_tumbling_daily"].builder(spark, SF_DIR)
    appended = QUERIES["stream_tumbling_watermark"].builder(spark, SF_DIR)
    full = {(r["day"], r["event_type"]): r["n_events"] for r in complete.collect()}
    emitted = {(r["day"], r["event_type"]): r["n_events"] for r in appended.collect()}
    assert emitted, "watermarked stream emitted nothing"
    assert set(emitted) <= set(full)
    for k, v in emitted.items():
        assert full[k] == v, f"window {k}: append {v} != complete {full[k]}"


def test_stateful_sessions_match_batch(spark, duck):
    out = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in QUERIES["stream_stateful_sessions"].builder(spark, SF_DIR).collect()
    }
    batch = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """
            WITH flagged AS (
                SELECT user_id,
                       CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    >= INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
            SELECT user_id, COUNT(*) AS n_events, SUM(is_new) AS n_sessions
            FROM flagged GROUP BY user_id
            """
        ).fetchall()
    }
    assert out == batch
