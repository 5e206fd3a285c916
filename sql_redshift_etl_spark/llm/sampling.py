"""Deterministic sampling & dataset-split operators (training-data
pipeline surface, SURVEY.md §2 L-rows companion).

Every operator here is HASH-deterministic, never RNG-based: a sample
defined by `md5(key) < threshold` is (a) reproducible across runs,
engines, and cluster sizes, (b) stable under data re-partitioning, and
(c) joinable — two tables sampled on the same key agree on membership.
That is the property a 100 TB training pipeline needs (re-running the
pipeline must not reshuffle the train/val/test assignment), and it is
what Spark's native `df.sample` (per-partition RNG) does NOT give.

Engine-portable: md5 over the decimal string of the key, compared on the
first 4 hex chars as a fixed-width lowercase hex string — lexicographic
order on fixed-width lowercase hex IS numeric order, and both engines
emit md5 as lowercase hex. 16-bit resolution ⇒ fraction granularity
1/65536; use more chars for finer fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.functions.dialect import dec
from sql_redshift_etl_spark.plans.registry import register


def hash_hex(key: Column, salt: str = "") -> Column:
    """First 4 hex chars of md5 of the key's string form — a 16-bit
    deterministic bucket, compared as a string. `salt` decorrelates
    independent sampling decisions made on the same key (sample-vs-split
    must not align)."""
    base = F.concat(F.lit(f"{salt}:"), key.cast("string")) if salt else key.cast("string")
    return F.substring(F.md5(base.cast("binary")), 1, 4)


def frac_threshold(fraction: float) -> str:
    """Hex-string threshold t such that `hash_hex(k) < t` selects
    round(fraction * 65536) of the 65536 buckets.

    Clamped at both ends: round(f*65536) == 65536 would format as the
    5-char '10000', which sorts BELOW most 4-char hashes and silently
    turned a ~100% sample into ~6% — so fractions that round to
    everything return 'zzzz' (> every hex hash: first-char compare
    decides) and negatives return '0000' (selects nothing)."""
    buckets = round(fraction * 65536)
    if buckets >= 65536:
        return "zzzz"
    if buckets <= 0:
        return "0000"
    return format(buckets, "04x")


def _duck_hex(key_sql: str, salt: str = "") -> str:
    arg = f"'{salt}:' || CAST({key_sql} AS VARCHAR)" if salt else f"CAST({key_sql} AS VARCHAR)"
    return f"substr(md5({arg}), 1, 4)"


@register(
    "sample_hash_fraction",
    tags=("L-sample",),
    oracle=f"""
        SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        FROM documents
        WHERE {_duck_hex('doc_id')} < '{frac_threshold(0.05)}'
        GROUP BY lang
        ORDER BY lang
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% deterministic document sample (3277/65536 hash buckets) keyed
    on doc_id, summarized per language.

    Scale: the predicate is a pure row-local expression — no shuffle, no
    RNG state, embarrassingly parallel, and the SAME rows are selected on
    any cluster size or partitioning."""
    d = load_table(spark, sf_dir, "documents")
    return bounded_sort(
        d.where(hash_hex(F.col("doc_id")) < frac_threshold(0.05))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc")),
        "lang",
    )


@register(
    "sample_train_val_test",
    tags=("L-sample",),
    oracle=f"""
        SELECT CASE
                   WHEN {_duck_hex('doc_id', 'split')} < '{frac_threshold(0.8)}' THEN 'train'
                   WHEN {_duck_hex('doc_id', 'split')} < '{frac_threshold(0.9)}' THEN 'val'
                   ELSE 'test'
               END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
        FROM documents
        GROUP BY 1
        ORDER BY split
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split, hash-assigned per document (salted
    so it is independent of any sampling decision on the same key), with
    per-split document and word counts.

    Scale: split assignment is row-local; the aggregation shuffles 3
    groups. Rerunning on appended data never reassigns an existing doc."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_hex(F.col("doc_id"), "split")
    split = (
        F.when(b < frac_threshold(0.8), "train")
        .when(b < frac_threshold(0.9), "val")
        .otherwise("test")
        .alias("split")
    )
    return bounded_sort(
        d.select(split, F.size(F.split("text", " ")).alias("nw"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(F.col("nw").cast("long")).alias("n_words")),
        "split",
    )


@register(
    "sample_stratified_per_label",
    tags=("L-sample", "W6"),
    oracle=f"""
        SELECT lang, doc_id, source
        FROM (
            SELECT lang, doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY {_duck_hex('doc_id', 'strat')}, doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 20
        ORDER BY lang, doc_id
    """,
)
def sample_stratified_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 20 documents per language, chosen by
    hash order (deterministic, unbiased within stratum) — the balanced
    eval-set construction idiom.

    Scale: the W6 top-k idiom ⇒ WindowGroupLimit partial limit before the
    per-lang shuffle; hash order means no full sort of any stratum."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(hash_hex(F.col("doc_id"), "strat"), "doc_id")
    return bounded_sort(
        d.select("lang", "doc_id", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .drop("rn"),
        "lang",
        "doc_id",
        # the final window walk above the lang exchange must stay
        # parallel — only the 20-per-lang output is bounded
        barrier=True,
    )


@register(
    "sample_salted_hot_agg",
    tags=("L-sample", "A1"),
    oracle="""
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def sample_salted_hot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the skewed event_type key (a
    handful of hot values own the whole table): stage 1 aggregates
    (event_type, salt) — 32-way spread of every hot key — stage 2 folds
    the partials. Result is EXACTLY the plain GROUP BY (the oracle is the
    unsalted SQL); the point is the shuffle shape under skew.

    Scale: with AQE skew handling off or overwhelmed, a hot key pins one
    reducer; salting bounds any reducer's share at 1/n_salts of the hot
    key. COUNT/SUM re-aggregate losslessly (decimal sums are associative).
    """
    ev = load_table(spark, sf_dir, "events")
    stage1 = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(32)))
        .groupBy("event_type", "_salt")
        .agg(F.count(F.lit(1)).alias("pc"), F.sum(dec("value")).alias("pv"))
    )
    return bounded_sort(
        stage1.groupBy("event_type").agg(
            F.sum("pc").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        ),
        "event_type",
    )


@register(
    "sample_domain_temperature",
    tags=("L-sample",),
    oracle=f"""
        WITH counts AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
        mn AS (SELECT MIN(n_lang) AS n_min FROM counts),
        rates AS (
            SELECT lang, n_lang, sqrt(CAST(n_min AS DOUBLE) / n_lang) AS rate
            FROM counts, mn
        ),
        kept AS (
            SELECT d.lang, r.n_lang, r.rate
            FROM documents d JOIN rates r USING (lang)
            WHERE r.rate >= 1.0
               OR {_duck_hex('d.doc_id', 'temp')}
                  < printf('%04x', CAST(FLOOR(r.rate * 65536) AS INT))
        )
        SELECT lang,
               MAX(n_lang) AS n_total,
               COUNT(*) AS n_kept,
               ROUND(MAX(rate), 6) AS target_rate,
               ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_lang), 6) AS achieved_rate
        FROM kept GROUP BY lang ORDER BY lang
    """,
)
def sample_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the standard LLM data-mixture
    move: acceptance rate r_d = (n_min / n_d)^(1-alpha) with alpha=0.5 —
    the smallest domain keeps everything, larger domains are downsampled
    toward sqrt-proportional shares). Deterministic per-row hash gate, so
    the mixture is reproducible across runs, engines, and partitionings.

    Scale: pass 1 is an O(domains) aggregate (broadcast back), pass 2 a
    map-side filter — no extra shuffle over the corpus. The per-domain
    threshold is compared as fixed-width hex (see module docstring);
    engine-identical because sqrt/floor/printf agree bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    mn = counts.agg(F.min("n_lang").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n_lang",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_lang")).alias("rate"),
    )
    thresh = F.format_string("%04x", F.floor(F.col("rate") * 65536).cast("int"))
    kept = d.join(F.broadcast(rates), "lang").where(
        (F.col("rate") >= 1.0) | (hash_hex(F.col("doc_id"), salt="temp") < thresh)
    )
    return bounded_sort(
        kept.groupBy("lang").agg(
            F.max("n_lang").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.max("rate"), 6).alias("target_rate"),
            F.round(F.count(F.lit(1)).cast("double") / F.max("n_lang"), 6).alias(
                "achieved_rate"
            ),
        ),
        "lang",
    )
