"""Scale-posture utilities (SURVEY.md §7 P4): skew salting, broadcast
sizing, and repartitioning helpers that make the operator library hold
at 100 TB / 1000 executors.

First line of defense is AQE (enabled in session.py): runtime partition
coalescing + skew-join splitting. These helpers cover the cases AQE
cannot fix:
- aggregation skew (AQE only splits *join* skew) → two-phase salted agg
- deliberate co-partitioning for repeated joins → repartition_for_join
- broadcast decisions for borderline dims → should_broadcast
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BROADCAST_BYTES = 512 * 1024 * 1024  # bigger than Spark's 10MB default: dims are cheap


def salted(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Attach a per-row salt that is independent of the row's VALUES —
    ``monotonically_increasing_id() % n_salts`` — so a hot key's rows
    spread over n_salts shuffle partitions even when the frame has been
    projected down to the skewed key alone. (A value-hash salt — the
    round-1 design — degenerates there: every hot-key row hashes alike
    and lands on ONE salt, defeating the split.) The id is partition-
    deterministic, not run-stable; the salt column never survives into
    results, so that's safe."""
    return df.withColumn(
        salt_col, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) — the hot key's rows split across
    n_salts reducers; phase 2 merges the partials by SUM, which is the
    correct merge for SUM and COUNT partials only. Decompose AVG into
    sum+count; MIN/MAX don't need salting at all (their partials are
    tiny and skew-free under plain partial aggregation).

        salted_agg(events, ["user_id"], {"n": F.count(F.lit(1)), "v": F.sum("value")})
    """
    phase1 = (
        salted(df, n_salts)
        .groupBy(*group_cols, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, expr in aggs.items()])
    )
    return phase1.groupBy(*group_cols).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Manual skew-join salting for when AQE's split heuristic misses:
    big side gets a random-ish salt per row; small side is exploded
    n_salts× so every (key, salt) pair finds its match. Use only when a
    single key dominates and the small side replication (n_salts×) is
    affordable."""
    b = salted(big, n_salts)
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return b.join(s, [key, "_salt"]).drop("_salt")


def repartition_for_join(df: DataFrame, key: str, num_partitions: int | None = None) -> DataFrame:
    """Pre-shuffle on the join key so several downstream joins/aggs on
    the same key reuse one exchange (Catalyst recognizes the existing
    hash partitioning) — the DISTKEY-at-runtime analog; the persisted
    version is sources.writers.write_bucketed_table."""
    return df.repartition(num_partitions, key) if num_partitions else df.repartition(key)


def should_broadcast(df: DataFrame, limit_bytes: int = DEFAULT_BROADCAST_BYTES) -> bool:
    """Estimate (via the analyzed plan's sizeInBytes) whether a side is
    broadcast-safe. Prefer explicit F.broadcast on known dims; use this
    for data-dependent sides in generic pipelines."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return int(plan.stats().sizeInBytes()) <= limit_bytes
    except Exception:
        return False
