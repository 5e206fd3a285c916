#!/usr/bin/env python
"""Sub-stage decomposition of the bench queries still >2x DuckDB at sf10
(VERDICT r4 item 4). For each query, time progressively larger prefixes
of the SAME plan (noop sink, warm best-of-N — the dedup-style profile,
BASELINE.md r2 item 5) next to the DuckDB full query and a DuckDB
scan-only probe, so the residual can be attributed to one of:

  - SCAN (stage1 ~= full): the time is reading/decoding parquet — the
    gap is scan-throughput vs DuckDB's reader, not plan shape;
  - AGG/JOIN (full >> stage1): the downstream operator dominates;
  - FLOOR (absolute times near the ~64-121 ms/job floor): orchestration.

Usage: python tools/residual_profile.py [sf_dir] [runs]
Defaults: _scratch/sf10, best-of-4.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.functions.dialect import dec, money, one_rate, rate  # noqa: E402
from sql_redshift_etl_spark.oracle import register_duckdb_views  # noqa: E402
from sql_redshift_etl_spark.plans.registry import all_queries  # noqa: E402
from sql_redshift_etl_spark.session import get_spark  # noqa: E402


def t_spark(df: DataFrame, runs: int) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm/compile
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def t_duck(con, sql: str, runs: int) -> float:
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def stages(spark, sf: str) -> dict[str, dict[str, DataFrame]]:
    """Per-query prefix plans. Each stage ADDS work to the previous one;
    column pruning means the scan stage reads exactly the columns the
    full query reads."""
    ts_lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ts_hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    one = one_rate()

    ev = load_table(spark, sf, "events").select("ts", "event_type", "value")
    li = load_table(spark, sf, "lineitem")
    docs = load_table(spark, sf, "documents").select("lang", "n_chars", "text")
    docs_mh = load_table(spark, sf, "documents").select("doc_id", "text")
    emb = load_table(spark, sf, "embeddings")

    from sql_redshift_etl_spark.llm import dedup as dd

    q1_cols = li.select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    )
    disc_price = money("l_extendedprice") * (one - rate("l_discount"))

    q3_c = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    q3_o = load_table(spark, sf, "orders").where(F.col("o_orderdate") < cutoff)
    q3_li = li.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    q3_join = q3_c.join(q3_o, q3_c.c_custkey == q3_o.o_custkey).join(
        q3_li, F.col("l_orderkey") == F.col("o_orderkey")
    )

    st_o = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= ts_lo) & (F.col("o_orderdate") < ts_hi)
    )
    st_c = load_table(spark, sf, "customer")
    st_li = li.select("l_orderkey", "l_extendedprice", "l_discount")
    st_join = st_li.join(st_o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        st_c, F.col("o_custkey") == F.col("c_custkey")
    )

    from sql_redshift_etl_spark.llm.similarity import QUERY_VEC_ID

    qvec = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qvec"))
    scored = emb.crossJoin(F.broadcast(qvec)).select(
        "vec_id",
        "label",
        (
            F.aggregate(
                F.zip_with("embedding", "qvec", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("dot"),
    )

    words = F.split(F.col("text"), " ")

    return {
        "events_tumbling_daily": {
            "scan": ev,
            "scan+trunc_project": ev.select(
                F.date_trunc("day", "ts").alias("day"), "event_type", "value"
            ),
            "full": ev.groupBy(
                F.date_trunc("day", "ts").alias("day"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value", 2)).cast("double").alias("tv"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            ),
        },
        "flagship_pricing_summary": {
            "scan": q1_cols,
            "scan+filter": q1_cols.where(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
            ),
            "scan+filter+decimal_project": q1_cols.where(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
            ).select(
                "l_returnflag", "l_linestatus",
                dec("l_quantity", 2, 4).alias("q"),
                money("l_extendedprice").alias("p"),
                disc_price.alias("dp"),
                (disc_price * (one + rate("l_tax"))).alias("ch"),
                rate("l_discount").alias("d"),
            ),
            "full": all_queries()["flagship_pricing_summary"].builder(spark, sf),
        },
        "q3_shipping_priority": {
            "scan_filtered_inputs": q3_li,
            "joins": q3_join.select("l_orderkey", "l_extendedprice", "l_discount"),
            "full": all_queries()["q3_shipping_priority"].builder(spark, sf),
        },
        "join_star_revenue": {
            "scan_fact": st_li,
            "joins": st_join.select("l_extendedprice", "l_discount", "c_nationkey"),
            "full": all_queries()["join_star_revenue"].builder(spark, sf),
        },
        "sim_knn_bruteforce": {
            "scan": emb.select("vec_id", "label", "embedding"),
            "scan+dot_project": scored,
            "full": all_queries()["sim_knn_bruteforce"].builder(spark, sf),
        },
        "text_doc_stats_by_lang": {
            "scan_no_text": docs.select("lang", "n_chars"),
            "scan+split_words": docs.select("lang", "n_chars", F.size(words).alias("nw")),
            "full": all_queries()["text_doc_stats_by_lang"].builder(spark, sf),
        },
        # r10 (verdict r9 item 2): the three-round steady drift
        # 0.69→0.76→0.89-0.95 s at sf0.1 with an untouched plan — name
        # the stage carrying it. Prefix order mirrors the plan: row-local
        # signing (md5 transforms, no shuffle) → the load-bearing
        # repartition(doc_id) exchange → band explode → band self-join →
        # full (adds the verify join + jaccard filter).
        "dedup_minhash_lsh": {
            "scan": docs_mh,
            "sign_rowlocal": dd._minhash_signatures(docs_mh, repartition=False),
            # fat = the pre-r10 exchange (shingle sets ride the shuffle);
            # slim = the adopted shape (doc_id + m0..m7 only) — the delta
            # between these two rows is what the r10 fix reclaimed
            "sign+repartition_fat": dd._minhash_signatures(docs_mh),
            "sign+repartition_slim": dd._minhash_signatures(
                docs_mh, repartition=False
            )
            .drop("sh_set", "n_sh")
            .repartition(F.col("doc_id")),
            "sign+bands": dd.lsh_band_buckets(docs_mh),
            "sign+bands+selfjoin": dd.banded_candidates(
                dd.lsh_band_buckets(docs_mh), "doc_id", "doc_a", "doc_b"
            ),
            "full": all_queries()["dedup_minhash_lsh"].builder(spark, sf),
        },
    }


DUCK_SCAN_PROBES = {
    # cheapest full-column-read probe per query's input relation
    "events_tumbling_daily": "SELECT max(ts), max(event_type), sum(value) FROM events",
    "flagship_pricing_summary": (
        "SELECT max(l_returnflag), max(l_linestatus), sum(l_quantity),"
        " sum(l_extendedprice), sum(l_discount), sum(l_tax), max(l_shipdate) FROM lineitem"
    ),
    "q3_shipping_priority": (
        "SELECT sum(l_extendedprice) FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'"
    ),
    "join_star_revenue": "SELECT sum(l_extendedprice), sum(l_discount), max(l_orderkey) FROM lineitem",
    "sim_knn_bruteforce": "SELECT max(len(embedding)) FROM embeddings",
    "text_doc_stats_by_lang": "SELECT max(len(string_split(text, ' '))) FROM documents",
    "dedup_minhash_lsh": "SELECT max(doc_id), max(len(text)) FROM documents",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, "_scratch", "sf10")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("residual-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    con = duckdb.connect()
    register_duckdb_views(con, sf)
    qs = all_queries()
    for name, st in stages(spark, sf).items():
        row: dict = {"query": name, "sf_dir": sf, "stages": {}}
        for label, df in st.items():
            row["stages"][label] = t_spark(df, runs)
        row["duck_full"] = t_duck(con, qs[name].oracle, runs)
        row["duck_scan_probe"] = t_duck(con, DUCK_SCAN_PROBES[name], runs)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
