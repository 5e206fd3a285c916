#!/usr/bin/env python
"""Generate larger scale factors from sf0.1 by key-shifted replication,
into _scratch/sf{N} — the input for tools/scale_trend.py.

Why: the driver fixtures stop at sf0.1 (≈17 MB total, single-row-group
files), which is exactly the regime where a distributed engine's fixed
costs dominate and a single-node columnar engine's don't. The 100 TB
claim needs the opposite trend line — ratio vs DuckDB falling as data
grows — so we manufacture the next points ourselves.

Replication preserves workload shape:
- fact keys shift by replica × (max_key+1), so join fan-outs
  (orders↔lineitem↔customer/part) replicate instead of multiplying;
- dims (region/nation/supplier) stay fixed, like real star schemas;
- document text gets a per-replica word prefix, so replica r of a doc
  is NOT a near-dup of replica 0 — the dedup workload scales linearly
  (10× docs → 10× true pairs), not quadratically;
- events shift user_id, so sessionization gets 10× users, same
  sessions-per-user.

Output is written by Spark with `replica` as a repartition column →
multi-file, multi-row-group parquet: scans actually parallelize, which
is the point of measuring at this size.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import TABLES, load_table  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402

SRC_SF = "/root/testdata/sf0.1"
DIMS = ("region", "nation", "supplier")

# key column -> shift base is max(key)+1 of the source table owning it
KEY_SHIFTS: dict[str, list[tuple[str, str, str]]] = {
    # table -> [(column, base_table, base_column)]
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
    ],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}


def _bases(spark: SparkSession) -> dict[tuple[str, str], int]:
    out: dict[tuple[str, str], int] = {}
    for shifts in KEY_SHIFTS.values():
        for _, bt, bc in shifts:
            if (bt, bc) not in out:
                out[(bt, bc)] = (
                    load_table(spark, SRC_SF, bt).agg(F.max(bc)).collect()[0][0] + 1
                )
    return out


def _replicate(
    spark: SparkSession, name: str, factor: int, bases: dict[tuple[str, str], int]
) -> DataFrame:
    src = load_table(spark, SRC_SF, name)
    rep = src.crossJoin(
        spark.range(factor).select(F.col("id").alias("replica"))
    )
    for col, bt, bc in KEY_SHIFTS.get(name, []):
        rep = rep.withColumn(col, F.col(col) + F.col("replica") * F.lit(bases[(bt, bc)]))
    if name == "documents":
        # make replicas non-near-dups: prefix every word with r<i>_ for
        # replica i>0, so shingle sets are disjoint across replicas and
        # the near-dup pair count scales linearly, not quadratically
        rep = rep.withColumn(
            "text",
            F.when(F.col("replica") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(F.lit("r"), F.col("replica").cast("string"), F.lit("_"), w),
                    ),
                    " ",
                )
            ),
        )
    if name == "embeddings":
        # Same honesty requirement as documents, vector form: a verbatim
        # replica is an EXACT dup (cosine 1), so high factors would make
        # the corpus a degenerate pile of identical vectors and the ANN
        # dedup's output itself quadratic in the factor. Perturb replica
        # r>0 by a norm-preserving cyclic component shift + deterministic
        # sign flips (xxhash64 on (replica, index)) — replicas land
        # near-orthogonal to their originals, keeping the corpus
        # near-uniform like the source, with pair counts growing
        # linearly. Replica 0 stays verbatim.
        dim = 64
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        shifted = F.transform(
            idx,
            lambda i: F.element_at(
                F.col("embedding"), ((i + F.col("replica")) % dim + 1).cast("int")
            )
            * F.when(F.pmod(F.xxhash64(F.col("replica"), i), 2) == 0, -1.0).otherwise(1.0),
        )
        rep = rep.withColumn(
            "embedding",
            F.when(F.col("replica") == 0, F.col("embedding")).otherwise(
                shifted.cast("array<float>")
            ),
        )
    return rep


def main() -> None:
    factor = int(os.environ.get("SCALE_FACTOR_X", "10"))
    dst = os.environ.get(
        "SCALE_DST", os.path.join(REPO_ROOT, "_scratch", f"sf{0.1 * factor:g}")
    )
    # SCALE_TABLES=documents,embeddings restricts generation to the named
    # tables — the sf30/sf100 tiers exist only for the two heaviest dedup
    # pipelines, and a full-tier lineitem at factor 1000 would be ~20 GB
    # of data no query there reads.
    only = os.environ.get("SCALE_TABLES")
    tables = [t.strip() for t in only.split(",")] if only else list(TABLES)
    spark = get_spark("make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    bases = _bases(spark)
    for name in tables:
        path = os.path.join(dst, f"{name}.parquet")
        if name in DIMS:
            load_table(spark, SRC_SF, name).write.mode("overwrite").parquet(path)
            continue
        (
            _replicate(spark, name, factor, bases)
            .drop("replica")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
        print(f"wrote {path}")
    print(f"done in {time.perf_counter() - t0:.1f}s -> {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
