#!/usr/bin/env python
"""Wall-clock trend for the two heaviest dedup pipelines at the sf30 and
sf100 tiers (VERDICT r4 item 5) — documents+embeddings-only tiers from
``SCALE_TABLES=documents,embeddings tools/make_scaled_data.py``.

- dedup_minhash_lsh: the production pipeline verbatim
  (minhash_lsh_pairs_df), Spark noop-sink warm best-of-N, plus the
  DuckDB oracle twin where it completes within the per-engine timeout.
- dedup_embedding_ann: the banded sign-LSH pipeline at the tier's
  SCALE-AWARE banding (ann_banding_for(n) — the fixture's frozen 8×8
  saturates at 2^8 buckets/band; see the policy docstring), reporting
  banding, candidate count, verified-pair count, and wall time.

Usage: python tools/dedup_scale_trend.py [sf_dir ...] [--runs=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import duckdb  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    ann_banding_for,
    embedding_ann_candidates,
    embedding_ann_pairs_df,
    minhash_lsh_pairs_df,
    minhash_pairs_oracle,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402

DUCK_TIMEOUT_HINT_DOCS = 2_000_000  # skip the DuckDB twin above this


def t_spark(df, runs: int) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    runs = 2
    dirs = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            dirs.append(a)
    dirs = dirs or [
        os.path.join(REPO_ROOT, "_scratch", "sf30"),
        os.path.join(REPO_ROOT, "_scratch", "sf100"),
    ]
    spark = get_spark("dedup-scale-trend")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}", file=sys.stderr)
            continue
        row: dict = {"sf_dir": d}
        has_docs = os.path.exists(os.path.join(d, "documents.parquet"))
        n_docs = 0
        if has_docs:  # embeddings-only tiers (sf300) skip the minhash leg
            docs = load_table(spark, d, "documents")
            n_docs = docs.count()
            row["n_docs"] = n_docs
            mh = minhash_lsh_pairs_df(docs)
            row["minhash_spark_s"] = t_spark(mh, runs)
            row["minhash_pairs"] = mh.count()
        if has_docs and n_docs <= DUCK_TIMEOUT_HINT_DOCS:
            con = duckdb.connect()
            path = os.path.join(d, "documents.parquet")
            if os.path.isdir(path):
                path = os.path.join(path, "*.parquet")
            con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
            sql = minhash_pairs_oracle()
            con.execute(sql).fetchall()  # warm
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            row["minhash_duck_s"] = round(best, 2)
            row["minhash_ratio"] = round(row["minhash_spark_s"] / best, 2)
            con.close()
        emb = load_table(spark, d, "embeddings")
        n_vec = emb.count()
        n_bands, band_bits = ann_banding_for(n_vec)
        row.update({"n_vectors": n_vec, "ann_bands": n_bands, "ann_band_bits": band_bits})
        if os.environ.get("SKIP_CANDIDATE_COUNT") != "1":
            # one extra full candidate-generation pass; the band audit's
            # pair-mass number is the cheap substitute at the big tiers
            row["ann_candidates"] = embedding_ann_candidates(
                emb, n_bands=n_bands, band_bits=band_bits
            ).count()
        ann = embedding_ann_pairs_df(emb, n_bands=n_bands, band_bits=band_bits, tau=0.9)
        row["ann_spark_s"] = t_spark(ann, runs)
        row["ann_pairs_tau09"] = ann.count()
        if "ann_candidates" in row:
            row["ann_candidate_fraction_of_pairs"] = round(
                row["ann_candidates"] / (n_vec * (n_vec - 1) / 2), 6
            )
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
