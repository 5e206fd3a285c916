"""Source connectors (SURVEY.md §2.1): Redshift COPY analogs (CSV/JSON/
Parquet bulk load), JDBC reads, and partitioned/manifest ingest.

The reference's ETL surface is COPY-from-S3 + JDBC; Spark-first that is
``spark.read.<format>`` with explicit schemas (never inferSchema on a
100 TB load — one pass saved) and JDBC reads with partitioned pulls.

JDBC paths are wiring-only here (no live Redshift to test against —
SURVEY.md §7 "What we will NOT build"); option assembly is unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    *,
    header: bool = True,
    delimiter: str = ",",
    multi_line: bool = True,
    null_value: str | None = None,
) -> DataFrame:
    """COPY ... FORMAT CSV analog: schema-on-read bulk CSV load.

    Explicit schema is mandatory — inferSchema would scan the data twice
    and guess types per-file (drifting schemas across a 100 TB prefix).

    ``multi_line`` defaults ON for correctness: a quoted text field
    containing a newline (routine in free-text columns; Spark's own CSV
    writer emits them) would otherwise split mid-record and PERMISSIVE
    mode would silently null both fragments. The cost is per-FILE scan
    parallelism (multiLine CSV is not splittable); at 100 TB prefer many
    moderate files, or escaped/newline-free text with multi_line=False
    for splittable scans.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
    )
    if null_value is not None:
        # COPY ... NULL AS 'str' (r5): the writer-side sentinel reads
        # back as SQL NULL. Compressed inputs (.gz/.bz2) need no option —
        # Spark's text sources decompress by extension.
        reader = reader.option("nullValue", null_value)
    return reader.csv(path)


def read_json_lines(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """COPY ... FORMAT JSON analog: newline-delimited JSON with explicit
    schema (PERMISSIVE: malformed rows → nulls, not job failure — the
    COPY MAXERROR analog is a post-load null-rate check)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_partitioned(
    spark: SparkSession, base_path: str, glob: str | None = None, schema=None
) -> DataFrame:
    """Manifest/partitioned ingest (S7): hive-style date-partitioned
    prefixes with partition discovery rooted at basePath, so partition
    columns survive and predicate → partition pruning works.

    Pass ``schema`` (e.g. the schema of the frame that was written) when
    the prefix may be EMPTY — a partitioned write of zero rows emits no
    files, and schema inference then throws UNABLE_TO_INFER_SCHEMA where
    an empty relation is the correct answer (empty date slices are
    routine in incremental pipelines)."""
    reader = spark.read.option("basePath", base_path)
    if schema is not None:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(base_path)


def jdbc_reader_options(
    url: str,
    table_or_query: str,
    *,
    is_query: bool = False,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    user: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """Assemble Spark JDBC source options for a Redshift-style read (S3).

    Partitioned pulls (partitionColumn/lowerBound/upperBound/
    numPartitions) are the difference between 1 connection dragging the
    whole table and N parallel range scans — required at warehouse scale.
    """
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    opts["query" if is_query else "dbtable"] = table_or_query
    if partition_column is not None:
        if is_query:
            raise ValueError("partitionColumn requires dbtable, not query")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds and numPartitions")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """JDBC source read (S3) — thin wrapper over jdbc_reader_options."""
    return spark.read.format("jdbc").options(**jdbc_reader_options(**kwargs)).load()
