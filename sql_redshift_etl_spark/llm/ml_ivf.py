"""IVF ANN with a real trained coarse quantizer (SURVEY.md §2.9 L3):
pyspark.ml KMeans centroids instead of the per-label means that
`sim_ivf_search` uses — the production IVF layout, where cell
boundaries come from the data rather than from metadata.

Training (KMeans.fit) is iterative — k Spark jobs per iteration over a
sampled corpus — and runs ONCE per index build; assignment + search are
the same broadcast-centroid, cell-pruned scans as sim_ivf_search.
Rows-only for the cross-engine oracle (seeded k-means is not
SQL-expressible); pytest asserts top-10 recall vs the brute-force exact
query and that the index searches only nprobe cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.llm.similarity import QUERY_VEC_ID, _cosine
from sql_redshift_etl_spark.plans.registry import register

HAVE_ML = True
try:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
except ImportError:  # pragma: no cover
    HAVE_ML = False

N_CELLS = 8
N_PROBE = 2


@register("sim_ivf_kmeans", tags=("L3",))  # rows-only: seeded k-means, not SQL-expressible
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a trained KMeans quantizer (L3): fit k=8 centroids
    (seeded, deterministic per Spark version), assign every vector to its
    cell map-side, probe the nprobe=2 cells nearest the query, exact
    cosine within the probed cells only.

    Scale: fit() samples/aggregates per iteration (tree-aggregated, no
    driver collect of the corpus); the trained model is k×dim — broadcast
    as part of the transform. Cell id becomes the partition column on
    disk, so every later query prunes |n·nprobe/k| vectors. This is the
    same plan FAISS-on-Spark layouts use, minus the product quantizer.
    """
    if not HAVE_ML:
        raise RuntimeError("pyspark.ml not available")
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        "label",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    km = KMeans(k=N_CELLS, seed=42, featuresCol="features", predictionCol="cell")
    if vecs.isEmpty():
        # Contract error, stated plainly: a quantizer cannot be trained
        # on zero vectors (MLlib's raw failure here is an opaque JVM
        # error). Empty CORPUS slices are fine downstream — it is the
        # TRAINING set that must be non-empty.
        raise ValueError("sim_ivf_kmeans: cannot train a KMeans quantizer on an empty embeddings table")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "label", "embedding", "cell")

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, cvec array<double>",
    )
    qrow = e.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qvec"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(qrow))
        .select("cell", _cosine(F.col("cvec"), F.col("qvec")).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("cell"))
        .limit(N_PROBE)
        .select("cell")
    )
    cand = (
        assigned.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probe_cells), "cell")
        .crossJoin(F.broadcast(qrow))
    )
    return (
        cand.select(
            "vec_id", "label", "cell", _cosine(F.col("embedding"), F.col("qvec")).alias("cos_raw")
        )
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "cell", F.round("cos_raw", 6).alias("cosine"))
    )
