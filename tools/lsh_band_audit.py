#!/usr/bin/env python
"""Measure the LSH band-bucket size distribution for BOTH dedup paths
(VERDICT r3 "what's wrong" #4; extended r5 to the sf30/sf100 tiers and
the embedding sign-LSH side per VERDICT r4 item 5).

For each sf dir:
- MinHash path (documents): bucket sizes over (band_idx, band_val), top
  buckets, candidate-pair mass sum(n*(n-1)/2). Band values are minhash
  TUPLES (unbounded value space), so buckets only collect true near-dup
  groups and pair mass per doc should stay ~CONSTANT as the corpus
  grows — asserted below.
- Embedding sign-LSH path: the same stats for the band relation at the
  tier's SCALE-AWARE banding (llm.dedup.ann_banding_for — fixed 8-bit
  bands have only 256 buckets and saturate: constant FRACTION of n²
  pair space = quadratic absolute growth). Asserted: pair mass stays
  within the linear budget n_vectors × n_bands × target_bucket.

Prints one JSON line per audit plus ASSERT lines; exits nonzero if any
assertion fails.

Usage: python tools/lsh_band_audit.py [sf_dir ...] [--cap=N]
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from sql_redshift_etl_spark.catalog import load_table  # noqa: E402
from sql_redshift_etl_spark.llm.dedup import (  # noqa: E402
    ann_banding_for,
    lsh_band_buckets,
)
from sql_redshift_etl_spark.session import get_spark  # noqa: E402

# MinHash buckets collect only true near-dup groups (unbounded band-value
# space); the fixture corpus measures ~2 candidate pairs per doc and
# replication preserves that linearly. 10 pairs/doc = 5x headroom before
# the audit flags a corpus as hot enough to need the band_cap guard.
MINHASH_PAIRS_PER_DOC_BOUND = 10.0


def _bucket_stats(bands, cap: int) -> dict:
    sizes = bands.groupBy("band_idx", "band_val").agg(F.count(F.lit(1)).alias("n"))
    pairs = F.col("n") * (F.col("n") - 1) / 2
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_size"),
        F.expr("percentile(n, 0.99)").alias("p99_size"),
        F.sum(pairs).alias("pair_mass_total"),
        F.sum(F.when(F.col("n") > cap, pairs).otherwise(F.lit(0))).alias("pair_mass_over_cap"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("buckets_over_cap"),
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias("docs_in_over_cap"),
    ).collect()[0]
    top = [
        {"band_idx": r["band_idx"], "n": r["n"]}
        for r in sizes.orderBy(F.col("n").desc()).limit(5).collect()
    ]
    out = {k: (float(v) if v is not None else None) for k, v in stats.asDict().items()}
    out["top_buckets"] = top
    return out


def audit_minhash(spark, sf_dir: str, cap: int) -> tuple[dict, list[str]]:
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    out = {"path": "minhash", "sf_dir": sf_dir, "cap": cap, "n_docs": n_docs}
    out.update(_bucket_stats(lsh_band_buckets(d), cap))
    out["pairs_per_doc"] = round(out["pair_mass_total"] / n_docs, 3)
    fails = []
    if out["buckets_over_cap"] > 0:
        fails.append(
            f"minhash {sf_dir}: {out['buckets_over_cap']:.0f} buckets over cap {cap} "
            "(band_cap guard WOULD trigger on this corpus)"
        )
    if out["pairs_per_doc"] > MINHASH_PAIRS_PER_DOC_BOUND:
        fails.append(
            f"minhash {sf_dir}: pair mass {out['pairs_per_doc']}/doc exceeds the "
            f"linear-growth bound {MINHASH_PAIRS_PER_DOC_BOUND} — candidate mass "
            "is no longer linear in corpus size"
        )
    return out, fails


def audit_embedding(spark, sf_dir: str, cap: int) -> tuple[dict, list[str]]:
    from sql_redshift_etl_spark.llm.similarity import sign_signature_col

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    n_bands, band_bits = ann_banding_for(n)
    sig = e.select("vec_id", sign_signature_col(n_bands * band_bits).alias("sig"))
    band_vals = F.array(
        *[F.substring("sig", b * band_bits + 1, band_bits) for b in range(n_bands)]
    )
    bands = sig.select("vec_id", F.posexplode(band_vals).alias("band_idx", "band_val"))
    out = {
        "path": "embedding",
        "sf_dir": sf_dir,
        "cap": cap,
        "n_vectors": n,
        "n_bands": n_bands,
        "band_bits": band_bits,
    }
    out.update(_bucket_stats(bands, cap))
    out["candidates_per_vector"] = round(2 * out["pair_mass_total"] / n, 2)
    # Linearity bound: with expected uniform bucket e = n/2^b, uniform
    # occupancy predicts pair mass = bands·n·e/2 (LINEAR in n — e is
    # bounded by 2·target_bucket thanks to the ceil in ann_banding_for).
    # Sign-LSH buckets on near-uniform corpora are overdispersed by a
    # measured ~2× (the angular distribution concentrates projections),
    # so assert within 3× of the uniform prediction — quadratic
    # saturation (the fixed-band failure mode) overshoots this by orders
    # of magnitude, dispersion never does.
    e_bucket = n / 2.0**band_bits
    uniform_mass = n_bands * n * e_bucket / 2
    out["dispersion_vs_uniform"] = round(out["pair_mass_total"] / uniform_mass, 2)
    fails = []
    if out["pair_mass_total"] > 3 * uniform_mass:
        fails.append(
            f"embedding {sf_dir}: pair mass {out['pair_mass_total']:.3g} exceeds 3× the "
            f"uniform-occupancy prediction {uniform_mass:.3g} — scale-aware banding "
            "failed to keep candidates linear"
        )
    return out, fails


def main() -> None:
    cap = 1000
    dirs = []
    for a in sys.argv[1:]:
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])
        else:
            dirs.append(a)
    dirs = dirs or [
        "/root/testdata/sf0.1",
        os.path.join(REPO_ROOT, "_scratch", "sf10"),
    ]
    spark = get_spark("lsh-band-audit")
    spark.sparkContext.setLogLevel("ERROR")
    all_fails: list[str] = []
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}", file=sys.stderr)
            continue
        for fn, table in ((audit_minhash, "documents"), (audit_embedding, "embeddings")):
            if not os.path.exists(os.path.join(d, f"{table}.parquet")):
                continue
            row, fails = fn(spark, d, cap)
            print(json.dumps(row), flush=True)
            all_fails.extend(fails)
    for f in all_fails:
        print(f"ASSERT FAIL: {f}")
    if not all_fails:
        print("ASSERT OK: minhash pair mass linear-per-doc, no bucket over cap; "
              "embedding pair mass within 3x the uniform-occupancy prediction "
              "(linear in n) at the scale-aware banding")
    spark.stop()
    sys.exit(1 if all_fails else 0)


if __name__ == "__main__":
    main()
