#!/usr/bin/env python
"""Streaming walls: setup-vs-work attribution (r14, VERDICT item 6).

For the two heaviest streaming queries (stream_stream_interval_join,
stream_stateful_sessions) this times the builder end-to-end, then splits
it into (a) source/schema setup, (b) the streaming run itself with the
per-micro-batch durationMs breakdown from StreamingQueryProgress
(queryPlanning / addBatch / walCommit / commitOffsets / stateOperators),
and (c) the final batch read-back — so "the wall is availableNow +
checkpoint machinery" is measured, not asserted. A second pass re-runs
the stream under different spark.sql.shuffle.partitions values to price
the O(partitions) state-store + WAL cost per micro-batch.

Usage: python tools/stream_attribution.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from sql_redshift_etl_spark.session import get_spark  # noqa: E402
from sql_redshift_etl_spark.streaming.pipeline import (  # noqa: E402
    interval_join_clicks_purchases,
    read_events_stream,
    stateful_session_counts,
)


def run_stream(agg, name: str, output_mode: str) -> dict:
    spark = agg.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    t0 = time.perf_counter()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [json.loads(p.json) for p in query.recentProgress]
    return {"wall": wall, "progress": prog}


def attribution(tag: str, make_agg, output_mode: str) -> None:
    print(f"== {tag} ==")
    t0 = time.perf_counter()
    agg = make_agg()
    setup = time.perf_counter() - t0
    r = run_stream(agg, f"attr_{tag}", output_mode)
    print(f"source/plan setup: {setup:.3f}s  stream run: {r['wall']:.3f}s")
    for p in r["progress"]:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        state = ", ".join(
            f"commit={s.get('commitTimeMs')}ms mem={s.get('memoryUsedBytes')}"
            for s in so
        )
        print(
            f"  batch {p['batchId']}: rows={p.get('numInputRows')} "
            f"trigger={d.get('triggerExecution')}ms addBatch={d.get('addBatch')}ms "
            f"planning={d.get('queryPlanning')}ms wal={d.get('walCommit')}ms "
            f"offsets={d.get('commitOffsets')}ms latestOffset={d.get('latestOffset')}ms "
            f"[{state}]"
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    attribution(
        "interval_join",
        lambda: interval_join_clicks_purchases(spark, sf_dir, gap_minutes=30),
        "append",
    )
    attribution(
        "stateful_sessions",
        lambda: stateful_session_counts(read_events_stream(spark, sf_dir)),
        "update",
    )

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    print("== shuffle-partition sensitivity (stream run wall, best-of-3) ==")
    for n in (32, 8, 1):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        for tag, mk, mode in (
            ("interval_join", lambda: interval_join_clicks_purchases(spark, sf_dir, 30), "append"),
            ("stateful_sessions", lambda: stateful_session_counts(read_events_stream(spark, sf_dir)), "update"),
        ):
            best = min(run_stream(mk(), f"sens_{tag}_{n}", mode)["wall"] for _ in range(3))
            rows = spark.table(f"sens_{tag}_{n}").count()
            print(f"partitions={n:3d} {tag:18s} best={best:.3f}s rows={rows}")
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    spark.stop()


if __name__ == "__main__":
    main()
