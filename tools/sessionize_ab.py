#!/usr/bin/env python
"""A/B: events_sessionize's window chain (lag → new-session flag →
running-sum session id → groupBy aggregate: one shuffle, one sort, two
window passes over every event) vs a native F.session_window
aggregation (one shuffle, one sort, sessions built in a single
UpdatingSessions pass) with a row_number() over the per-user AGGREGATED
sessions to reproduce the ordinal session_id column.

VERDICT r7 item 4 / the r7 builder note: bench total is now ~62%
dedup_minhash_lsh + sessionize, both kernel-bound — this measures the
one statement-level reformulation sessionize has left. Adopt only if
values are bit-identical and steady-state improves beyond the ±15-17%
small-query band; otherwise record reject-with-number in BASELINE.md
(the r2-r5 discipline).

Usage: python tools/sessionize_ab.py [sf_dir ...]
Defaults to /root/testdata/sf0.1, _scratch/sf1, _scratch/sf10.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.functions.dialect import dsum  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def _native(ev: DataFrame) -> DataFrame:
    """session_window-native formulation of events_sessionize's output.

    F.session_window's half-open [ts, ts+gap) merge rule is exactly the
    chain's `gap >= 30 min starts a new session` test (events.py keeps
    the two aligned on purpose), so the session EXTENTS agree; the
    ordinal session_id is reproduced by numbering each user's sessions
    by start time — a second window pass, but over the aggregated
    session rows (tiny), not the raw events."""
    agg = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", 2, 8).alias("session_value"),
    )
    w = Window.partitionBy("user_id").orderBy("session_start")
    return agg.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        "session_value",
    )


def _best_of(df: DataFrame, runs: int = 5) -> float:
    df.write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _exchanges(df: DataFrame) -> int:
    return (
        df._jdf.queryExecution().executedPlan().toString().count("Exchange hashpartitioning")
    )


def _values_identical(a: DataFrame, b: DataFrame) -> bool:
    """Bit-exact comparison without collecting raw rows: hash every row
    to one 64-bit value, compare multiset via count + sum + xor-ish
    (sum of hashes over distinct rows + per-row counts)."""
    cols = sorted(a.columns)

    def sig(df: DataFrame):
        h = df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h")
        )
        return h.agg(
            F.count("h").alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.sum(F.abs("h") % 1000003).alias("m"),
        ).first()

    sa, sb = sig(a), sig(b)
    return tuple(sa) == tuple(sb)


def measure(spark: SparkSession, sf_dir: str) -> dict:
    ev = load_table(spark, sf_dir, "events")
    chain = all_queries()["events_sessionize"].builder(spark, sf_dir)
    native = _native(ev)
    same = _values_identical(chain, native)
    res = {
        "sf_dir": sf_dir,
        "events": ev.count(),
        "identical_values": same,
        "chain_best": _best_of(chain),
        "native_best": _best_of(native),
        "chain_exchanges": _exchanges(chain),
        "native_exchanges": _exchanges(native),
    }
    res["speedup"] = round(res["chain_best"] / res["native_best"], 3)
    return res


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "_scratch", "sf1"),
        os.path.join(REPO_ROOT, "_scratch", "sf10"),
    ]
    spark = get_spark()
    for d in dirs:
        print(json.dumps(measure(spark, d)), flush=True)


if __name__ == "__main__":
    main()
