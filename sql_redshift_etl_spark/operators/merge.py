"""MERGE INTO upsert (E6 full form) — Redshift's `MERGE` statement
re-expressed as a relational plan.

Redshift MERGE semantics (public docs: MERGE INTO target USING source ON
cond WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN INSERT ...):
each target row with a source match is updated, each unmatched source row
is inserted, unmatched target rows pass through; a WHEN MATCHED ... THEN
DELETE clause drops matched rows instead. Spark's `MERGE INTO` SQL needs a
v2 table with row-level-operation support (Delta/Iceberg — not installed
here), so the operator builds the equivalent plan directly: ONE full-outer
join on the merge key + conditional projection. That is exactly the
physical plan a MERGE executes on any engine, minus the transactional
commit, and it scales the same way: one key-partitioned shuffle of
target+source. For the common incremental-ETL case (delta ≪ target),
``broadcast_source`` switches to an equivalent broadcast two-branch
plan — full-outer itself cannot broadcast on any engine — that never
shuffles the wide target (see merge_upsert's docstring).

MERGE requires the source to be unique on the merge key (Redshift raises
"found multiple matches" otherwise); callers pre-aggregate, as
``events_merge_upsert`` does.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import dec
from sql_redshift_etl_spark.plans.registry import register


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    update_set: dict[str, Column],
    insert_values: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Relational MERGE: full-outer join + conditional projection.

    - ``update_set``: WHEN MATCHED THEN UPDATE SET col = expr. Exprs refer
      to the two sides as ``t.<col>`` / ``s.<col>``. Columns not listed
      keep the target value.
    - ``insert_values``: WHEN NOT MATCHED THEN INSERT. Defaults to taking
      the source's column of the same name (``s.<col>``).
    - ``delete_when``: WHEN MATCHED AND <cond> THEN DELETE — matched rows
      where the condition is TRUE are dropped instead of updated. A NULL
      condition is NOT TRUE (SQL three-valued logic): the row falls
      through to the UPDATE branch, exactly as Redshift's MERGE treats a
      non-TRUE delete predicate.
    - ``broadcast_source``: the incremental-ETL case where the delta is
      tiny next to the target. A full-outer join CANNOT broadcast (no
      engine supports broadcast full-outer), so this flag switches to an
      equivalent two-branch plan: target LEFT JOIN broadcast(delta)
      (matched + target-only — the wide target never shuffles) unioned
      with the delta's LEFT ANTI inserts (only the target's KEY column
      shuffles). Same rows, no wide-side shuffle.

    Output schema = target schema (MERGE never changes the table shape).
    Merge keys are assumed non-null on both sides (enforced by Redshift's
    uniqueness requirement in practice); presence is detected on the key.
    """
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
    )

    t_present = F.col(f"t.{keys[0]}").isNotNull()
    s_present = F.col(f"s.{keys[0]}").isNotNull()

    def projection(columns: list[str]) -> list[Column]:
        out: list[Column] = []
        for c in columns:
            if c in keys:
                out.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
                continue
            upd = update_set.get(c, F.col(f"t.{c}"))
            ins = (insert_values or {}).get(c, F.col(f"s.{c}"))
            out.append(
                F.when(t_present & s_present, upd)
                .when(t_present, F.col(f"t.{c}"))
                .otherwise(ins)
                .alias(c)
            )
        return out

    # NULL delete predicate = not taken (coalesce to FALSE), never a drop.
    drop_filter = (
        ~(t_present & s_present & F.coalesce(delete_when, F.lit(False)))
        if delete_when is not None
        else None
    )

    if not broadcast_source:
        joined = t.join(s, on=cond, how="full_outer")
        if drop_filter is not None:
            joined = joined.where(drop_filter)
        return joined.select(*projection(target.columns))

    # Two-branch broadcast plan (see docstring). Branch 1: every target
    # row, with its (broadcast) match if any — covers matched + target-
    # only; t_present is always true here so the shared projection
    # reduces correctly. Branch 2: source-only inserts.
    matched = t.join(F.broadcast(s), on=cond, how="left_outer")
    if drop_filter is not None:
        matched = matched.where(drop_filter)
    branch1 = matched.select(*projection(target.columns))
    ins_only = s.join(t.select(*[F.col(f"t.{k}") for k in keys]), on=cond, how="left_anti")
    ins_out = [
        (
            F.col(f"s.{c}")
            if c in keys
            else (insert_values or {}).get(c, F.col(f"s.{c}"))
        ).alias(c)
        for c in target.columns
    ]
    return branch1.unionByName(ins_only.select(*ins_out))


@register(
    "events_merge_upsert",
    tags=("E6", "S6"),
    oracle="""
        WITH target AS (
            SELECT user_id,
                   COUNT(*) AS n_events,
                   SUM(CAST(value AS DECIMAL(18,2))) AS total_dec,
                   MAX(ts) AS last_ts
            FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY user_id
        ), source AS (
            SELECT user_id,
                   COUNT(*) AS n_events,
                   SUM(CAST(value AS DECIMAL(18,2))) AS total_dec,
                   MAX(ts) AS last_ts
            FROM events
            WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY user_id
        )
        SELECT
            COALESCE(t.user_id, s.user_id) AS user_id,
            COALESCE(t.n_events, 0) + COALESCE(s.n_events, 0) AS n_events,
            CAST(COALESCE(t.total_dec, 0) + COALESCE(s.total_dec, 0) AS DOUBLE)
                AS total_value,
            COALESCE(s.last_ts, t.last_ts) AS last_ts
        FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
    """,
)
def events_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 full form: MERGE the post-watermark event delta into a per-user
    profile table — matched users get counts/totals rolled forward and
    last_ts advanced; new users are inserted; untouched users pass through.

    Scale: both sides aggregate before the merge, so the full-outer join
    shuffles |users|, not |events|; in production the delta side is a
    day's users against an all-time profile table → ``broadcast_source``
    or a bucketed profile table removes the big-side shuffle entirely.
    """
    ev = load_table(spark, sf_dir, "events")
    watermark = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).alias("total_dec"),
            F.max("ts").alias("last_ts"),
        )

    target = profile(ev.where(F.col("ts") <= watermark))
    source = profile(ev.where(F.col("ts") > watermark))
    zero = F.lit(0).cast("decimal(28,2)")
    merged = merge_upsert(
        target,
        source,
        ["user_id"],
        update_set={
            "n_events": F.col("t.n_events") + F.col("s.n_events"),
            "total_dec": F.col("t.total_dec") + F.col("s.total_dec"),
            "last_ts": F.col("s.last_ts"),
        },
        insert_values={
            "n_events": F.col("s.n_events"),
            "total_dec": zero + F.col("s.total_dec"),
            "last_ts": F.col("s.last_ts"),
        },
    )
    return merged.select(
        "user_id",
        "n_events",
        F.col("total_dec").cast("double").alias("total_value"),
        "last_ts",
    )
