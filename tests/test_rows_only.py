"""Stronger local checks for queries that are rows-only in the driver
oracle (approximate / UDF-backed operators)."""

from __future__ import annotations

from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_approx_count_distinct_within_tolerance(spark, duck):
    est = {
        r["o_orderstatus"]: r["approx_custkeys"]
        for r in QUERIES["approx_count_distinct"].builder(spark, SF_DIR).collect()
    }
    exact = {
        s: n
        for s, n in duck.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    }
    assert set(est) == set(exact)
    for s in exact:
        assert abs(est[s] - exact[s]) / exact[s] < 0.05, (s, est[s], exact[s])


def test_embedding_ann_dedup_recall_and_pruning(spark):
    """dedup_embedding_ann vs the brute-force dedup_embedding_cosine
    baseline on the same τ=0.4: assert recall above the banding-curve
    floor for the fixture's adversarial near-uniform vectors (θ≈66° →
    1-(1-p^8)^8 ≈ 0.17; on production near-dups at cosine 0.9 the same
    curve gives ≈ 0.94), that every reported pair IS a true pair
    (precision 1 by construction — exact verify), and that the candidate
    set actually pruned vs all-pairs (the efficiency claim)."""
    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm import dedup

    truth = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["dedup_embedding_cosine"].builder(spark, SF_DIR).collect()
    }
    found = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["dedup_embedding_ann"].builder(spark, SF_DIR).collect()
    }
    assert found <= truth, f"false positives: {found - truth}"
    recall = len(found) / len(truth)
    assert recall >= 0.08, f"banded sign-LSH recall {recall} ({len(found)}/{len(truth)})"

    # Efficiency: candidate pairs ≪ all-pairs (measured on the SAME
    # production candidate stage via the shared helper).
    e = load_table(spark, SF_DIR, "embeddings")
    n = e.count()
    n_cand = dedup.embedding_ann_candidates(e).count()
    all_pairs = n * (n - 1) / 2
    assert n_cand < 0.10 * all_pairs, f"candidates {n_cand} vs all-pairs {all_pairs}"


def test_ann_lsh_recall_and_pruning(spark):
    """Fixture embeddings are near-uniform (best cosine ≈ 0.48), so the
    theory bound for 8-bit hyperplane LSH with Hamming≤2 probing is
    ≈ 0.27 top-10 recall (p=0.63/bit). Assert above the random-probing
    baseline AND that the candidate set actually pruned (the efficiency
    claim). On clustered real embeddings recall ≈ 1 at radius 1."""
    from pyspark.sql import functions as F
    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm.similarity import QUERY_VEC_ID, lsh_bucket_col

    exact = [r["vec_id"] for r in QUERIES["sim_knn_bruteforce"].builder(spark, SF_DIR).collect()]
    approx = [r["vec_id"] for r in QUERIES["sim_ann_lsh"].builder(spark, SF_DIR).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.15, f"LSH top-10 recall {recall} (exact={exact}, approx={approx})"

    e = load_table(spark, SF_DIR, "embeddings").withColumn("bucket", lsh_bucket_col())
    total = e.count()
    qbucket = e.where(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["bucket"]
    probed = e.where(
        F.aggregate(
            F.zip_with(
                F.split(F.col("bucket"), ""),
                F.split(F.lit(qbucket), ""),
                lambda a, b: F.when(a != b, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        <= 2
    ).count()
    assert probed / total < 0.55, f"LSH probed {probed}/{total} — no pruning win"


def test_ivf_recall_vs_bruteforce(spark):
    """nprobe=2 of 10 cells; fixture labels are not geometric clusters,
    so expected recall ≈ probed fraction. Assert above-random."""
    exact = [r["vec_id"] for r in QUERIES["sim_knn_bruteforce"].builder(spark, SF_DIR).collect()]
    approx = [r["vec_id"] for r in QUERIES["sim_ivf_search"].builder(spark, SF_DIR).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.1, f"IVF top-10 recall {recall}"


def test_multimodal_decode_deterministic(spark):
    df = QUERIES["multimodal_decode_features"].builder(spark, SF_DIR)
    rows1 = {r["doc_id"]: (r["mean_byte"], r["checksum"], r["aspect"]) for r in df.collect()}
    rows2 = {r["doc_id"]: (r["mean_byte"], r["checksum"], r["aspect"]) for r in df.collect()}
    assert rows1 == rows2 and len(rows1) > 0
    # checksum is sum(bytes) % 251 of a 16-byte md5 digest — bounded
    assert all(0 <= v[1] < 251 for v in rows1.values())


def test_minhash_finds_planted_neardups(spark, duck):
    """The fixtures plant ≥2 near-dup pairs (jaccard ≥ 0.97 within a
    source at sf0.001) — LSH must surface them."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"].builder(spark, SF_DIR).collect()
    }
    exact_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"].builder(spark, SF_DIR).collect()
    }
    assert exact_pairs, "expected planted near-dup pairs in fixtures"
    assert exact_pairs <= pairs, f"LSH missed planted pairs: {exact_pairs - pairs}"


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """Trained quantizer (k=8, nprobe=2): cells come from the data, so
    recall should beat the probed fraction (measured 0.6 at sf0.01) —
    assert comfortably above the per-label IVF's floor."""
    exact = [r["vec_id"] for r in QUERIES["sim_knn_bruteforce"].builder(spark, SF_DIR).collect()]
    rows = QUERIES["sim_ivf_kmeans"].builder(spark, SF_DIR).collect()
    approx = [r["vec_id"] for r in rows]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"KMeans-IVF top-10 recall {recall}"
    # pruning: results only come from nprobe distinct cells
    assert len({r["cell"] for r in rows}) <= 2


def test_ivf_kmeans_pinned_trains_and_prunes(spark):
    """The SQL-oracled Lloyd twin (r10): the oracle hash-compare covers
    value parity; this pins that the pinned training is REAL — the
    leftover labels (8/9, outside the 8 init cells) get absorbed into
    nearest cells, the absorption moves the centroids off the init
    means (so the unrolled iterations in the oracle are load-bearing),
    and the search still prunes to nprobe cells with above-floor
    recall."""
    from pyspark.sql import functions as F

    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm import ml_ivf

    e = load_table(spark, SF_DIR, "embeddings")
    vecs = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("u"),
        ml_ivf._pinned_quantize(F.col("embedding")).alias("uq"),
    )
    init = vecs.where(F.col("label") < ml_ivf.N_CELLS).withColumn(
        "cell", F.col("label").cast("int")
    )
    cent0 = ml_ivf._pinned_centroids(init)
    a1 = ml_ivf._pinned_assign(vecs, cent0)
    leftovers = a1.where(F.col("label") >= ml_ivf.N_CELLS)
    assert leftovers.where(F.col("cell").isNull()).count() == 0
    assert leftovers.count() > 0, "fixture should have labels beyond the init cells"
    cent1 = ml_ivf._pinned_centroids(a1)
    moved = (
        cent0.alias("x")
        .join(cent1.alias("y"), "cell")
        .where(F.col("x.cvec") != F.col("y.cvec"))
        .count()
    )
    assert moved > 0, "Lloyd iteration did not move any centroid"
    # end-to-end: same pruning/recall contract as the MLlib twin
    exact = [
        r["vec_id"]
        for r in QUERIES["sim_knn_bruteforce"].builder(spark, SF_DIR).collect()
    ]
    rows = QUERIES["sim_ivf_kmeans_pinned"].builder(spark, SF_DIR).collect()
    approx = [r["vec_id"] for r in rows]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.2, f"pinned-KMeans-IVF top-10 recall {recall}"
    assert len({r["cell"] for r in rows}) <= ml_ivf.N_PROBE


def test_pca_matches_numpy_reference(spark):
    """embedding_pca_project's distributed covariance + driver eigh
    must agree with numpy's reference PCA computed on the collected
    matrix: same eigenvalue spectrum, same projections (after the same
    deterministic sign fix), orthonormal components, and explained
    variance that actually sums the top-k spectrum."""
    import numpy as np

    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm.pca import fit_pca, project_pca

    emb = load_table(spark, SF_DIR, "embeddings")
    comps, mean, evr = fit_pca(emb, k=4)
    c = np.asarray(comps)
    assert c.shape == (4, 64)
    # orthonormal rows
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)

    x = np.stack([r["embedding"] for r in emb.select("embedding").collect()]).astype(
        np.float64
    )
    mu = x.mean(axis=0)
    assert np.allclose(mu, np.asarray(mean), atol=1e-9)
    cov = np.cov(x, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    # the k reported ratios match the reference spectrum
    assert np.allclose(np.asarray(evr), evals[:4] / evals.sum(), atol=1e-9)

    # reference projection with the same sign convention
    ref_evals, ref_vecs = np.linalg.eigh(cov)
    order = np.argsort(ref_evals)[::-1][:4]
    ref_c = ref_vecs[:, order].T.copy()
    for i in range(4):
        j = int(np.argmax(np.abs(ref_c[i])))
        if ref_c[i, j] < 0:
            ref_c[i] = -ref_c[i]
    assert np.allclose(c, ref_c, atol=1e-8)

    proj = project_pca(emb, comps, mean).select("vec_id", "pc_1").collect()
    got = {r["vec_id"]: r["pc_1"] for r in proj}
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    ref_p = (x - mu) @ ref_c.T
    for vid, rp in zip(ids, ref_p[:, 0]):
        assert abs(got[vid] - rp) < 1e-8


def test_hll_sketch_merge_lossless_and_accurate(spark, duck):
    """The daily-sketch union must estimate EXACTLY what the direct
    one-pass sketch estimates (mergeability is lossless by
    construction), and both within 5% of the exact distinct count."""
    rows = QUERIES["hll_sketch_partition_merge"].builder(spark, SF_DIR).collect()
    exact = {
        t: n
        for t, n in duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["approx_users_merged"] == r["approx_users_direct"], r
        e = exact[r["event_type"]]
        assert abs(r["approx_users_merged"] - e) / e < 0.05, (r, e)
