"""Targeted tests for the SURVEY.md §4 Redshift/Spark/DuckDB dialect
traps — each documents WHY the engine makes a translation choice, by
demonstrating the divergence the choice avoids."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_double_to_int_cast_diverges(spark, duck):
    """Bare double→int CAST: Spark truncates, DuckDB (and Redshift)
    rounds — why cast_conversions uses explicit FLOOR/CEIL instead."""
    s = spark.sql("SELECT CAST(2.7 AS INT) AS x").collect()[0]["x"]
    d = duck.execute("SELECT CAST(2.7 AS INT)").fetchone()[0]
    assert s == 2 and d == 3  # the divergence is real; the engine avoids it


def test_round_decimal_route_is_engine_identical(spark, duck):
    """ROUND semantics on raw doubles at half boundaries are
    engine-implementation-defined (half-up on the shortest repr vs
    half-even vs binary-value rounding) — so the engine standardizes on
    the DECIMAL route, which this test sweeps across half-boundary
    values and checks for exact cross-engine agreement."""
    vals = ["2.675", "123.45", "0.125", "99.995", "7.005", "-2.675", "-0.125"]
    for v in vals:
        expr = f"CAST(ROUND(CAST({v} AS DECIMAL(18,3)), 2) AS DOUBLE)"
        s = spark.sql(f"SELECT {expr} AS x").collect()[0]["x"]
        d = duck.execute(f"SELECT {expr}").fetchone()[0]
        assert s == d, (v, s, d)


def test_decimal_sum_bitwise_identical(spark, duck):
    """The exact-decimal rule: SUM(CAST(x AS DECIMAL)) cast back to double
    is bit-identical across engines, while raw double SUM is not
    guaranteed to be (order-dependent)."""
    s = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()[0]["s"]
    )
    d = duck.execute(
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem"
    ).fetchone()[0]
    assert s == d  # exact equality, not approx


def test_datediff_boundary_crossing(spark):
    """Redshift DATEDIFF counts boundary crossings: 1999-12-31 →
    2000-01-01 is 1 year, 1 month, 1 day."""
    from sql_redshift_etl_spark.functions.dialect import redshift_datediff

    df = spark.sql("SELECT DATE '1999-12-31' AS a, DATE '2000-01-01' AS b")
    row = df.select(
        redshift_datediff("year", F.col("a"), F.col("b")).alias("y"),
        redshift_datediff("month", F.col("a"), F.col("b")).alias("m"),
        redshift_datediff("day", F.col("a"), F.col("b")).alias("d"),
    ).collect()[0]
    assert (row["y"], row["m"], row["d"]) == (1, 1, 1)


def test_collect_list_requires_explicit_sort(spark):
    """listagg() sorts explicitly because collect_list order is
    partition-dependent — the helper's output must be stable across
    repartitionings."""
    from sql_redshift_etl_spark.functions.dialect import listagg

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    a = df.repartition(1).groupBy("n_regionkey").agg(listagg("n_name").alias("x"))
    b = df.repartition(7).groupBy("n_regionkey").agg(listagg("n_name").alias("x"))
    assert sorted(r["x"] for r in a.collect()) == sorted(r["x"] for r in b.collect())


def test_events_ns_truncation_is_lossless(spark, duck):
    """events.ts is TIMESTAMP(NANOS) parquet; the catalog's ns→µs integer
    division matches DuckDB's reader exactly (all fixture values are
    whole microseconds)."""
    from sql_redshift_etl_spark.catalog import load_table

    s = load_table(spark, SF_DIR, "events").agg(F.max("ts").alias("m")).collect()[0]["m"]
    d = duck.execute("SELECT MAX(ts) FROM events").fetchone()[0]
    assert s == d


def test_udaf_weighted_mean_matches_builtin(spark):
    """The grouped-agg Pandas UDF agrees with the built-in expression
    form within float tolerance (rows-only in the driver oracle)."""
    got = {
        r["event_type"]: r["weighted_value"]
        for r in QUERIES["udaf_weighted_mean"].builder(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("double")
    want = {
        r["event_type"]: r["w"]
        for r in ev.groupBy("event_type")
        .agg((F.sum(F.col("value") * k) / F.sum(k)).alias("w"))
        .collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert abs(got[t] - want[t]) < 1e-5, (t, got[t], want[t])


def test_ml_minhash_finds_planted_pairs(spark):
    """spark.ml MinHashLSH surfaces the same planted near-dup pairs as
    the exact blocked-Jaccard query."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"].builder(spark, SF_DIR).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"]) for r in QUERIES["dedup_minhash_ml"].builder(spark, SF_DIR).collect()
    }
    assert exact and exact <= ml, f"ml LSH missed {exact - ml}"