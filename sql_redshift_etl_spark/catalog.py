"""Fixture catalog: schema-stable loaders for the driver-generated tables.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under an sf directory. ``load_table`` normalizes the one physical quirk
(events.ts is TIMESTAMP(NANOS) which Spark 4 reads as bigint under
``nanosAsLong``) so every downstream operator sees clean Spark types.

Scale note: these loaders are plain ``spark.read.parquet`` — at 100 TB the
same call reads a partitioned directory tree and Catalyst does partition
pruning + predicate pushdown; nothing here assumes single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.session import apply_runtime_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing physical quirks.

    events.ts: stored as parquet TIMESTAMP(NANOS, false); under
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as bigint
    nanoseconds. All fixture values are exact microseconds (verified:
    epoch_ns % 1000 == 0 for every row), and DuckDB's reader likewise
    presents the column as microsecond TIMESTAMP — so integer-division
    ns→µs conversion here is lossless and oracle-exact.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def bounded_sort(df: DataFrame, *cols, barrier: bool = False) -> DataFrame:
    """Total order for a result whose row count is bounded at any scale.

    A bare ``.orderBy`` plans ``Exchange rangepartitioning`` whose
    RangePartitioner runs a SEPARATE driver-coordinated sampling job —
    measured 2 extra jobs ≈ 120–150 ms per query at sf0.1 (r13
    flagship decomposition, tools/job_floor_audit.py). A single
    partition sorted locally IS the same total order: identical rows,
    identical ordering, and zero sampling at every scale.

    The invariant that decides the form is the CoalESCED STAGE'S INPUT,
    not just the result's row count (r14 self-review): ``coalesce(1)``
    narrows the whole plan down to the nearest exchange below it.

    - ``barrier=False`` (default): only when that nearest exchange
      itself has bounded post-shuffle cardinality — a final aggregate
      keyed on a bounded domain (flag/status/lang/priority grains).
      Then the coalesce merely merges a handful of groups and the
      map-side/partial parallelism below the exchange is untouched.
    - ``barrier=True``: when the result is bounded but the stage above
      the last exchange is NOT — an unbounded aggregate merge whose
      output a filter caps afterwards (q11's >1.1%-share, q15's
      max-tie), a group-limited window (stratified top-20), or an
      exchange-free row-local plan (pii's doc_id<=200 scan). A
      ``repartition(1)`` inserts an Exchange SinglePartition barrier so
      everything upstream keeps its parallelism and only the bounded
      result crosses; still no sampling job (single-partition exchanges
      never sample — the saving over rangepartitioning survives).

    NEVER use either form on an unbounded result (per-doc/per-row
    outputs): there the range sort's parallelism is exactly what you
    want.
    """
    if barrier:
        return df.repartition(1).sortWithinPartitions(*cols)
    return df.coalesce(1).sortWithinPartitions(*cols)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for the spark.sql(...) path."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
