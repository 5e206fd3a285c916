"""Corpus-curation operators for LLM training-data pipelines: intra-doc
repetition scoring, benchmark-contamination checks, sequence packing,
per-domain quotas, PII redaction, and embedding quantization.

These complete the training-pipeline surface around dedup/similarity/
text (SURVEY.md §2.9): the steps between "raw crawl" and "tokenizer
input" that a 100 TB curation run actually executes. Every operator is
built-in Spark SQL functions (whole-stage codegen, no Python in the hot
path) and every one is hash/order-deterministic so reruns and engine
ports agree bit-for-bit.

Scale notes per operator are in the docstrings; the common theme: score
and transform ROW-LOCALLY wherever possible (repetition, PII,
quantization — zero shuffles), broadcast the small reference set when
one exists (contamination), and keep the only unavoidable shuffles
keyed on high-cardinality or per-domain keys (packing, quotas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.llm.dedup import _DUCK_SHINGLES, _SPARK_SHINGLES
from sql_redshift_etl_spark.llm.sampling import _duck_hex, hash_hex
from sql_redshift_etl_spark.plans.registry import register

# Gopher/C4-style repetition thresholds: flag a doc when over a fifth of
# its 3-gram occurrences are repeats or under 30% of words are distinct.
REP_3GRAM_MAX = 0.2
DISTINCT_WORD_MIN = 0.3

CONTEXT_LEN = 512  # packing window, tokens

PROBE_MOD = 97  # doc_id % PROBE_MOD == 0 ⇒ doc stands in for an eval set


@register(
    "curation_repetition_scores",
    tags=("L5",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   len(w) AS n_words,
                   len(list_distinct(w)) AS n_distinct_words,
                   len({_DUCK_SHINGLES}) AS n_3grams,
                   len(list_distinct({_DUCK_SHINGLES})) AS n_distinct_3grams
            FROM t WHERE len(w) >= 3
        )
        SELECT doc_id, lang, n_words,
               ROUND(1.0 - CAST(n_distinct_3grams AS DOUBLE) / n_3grams, 6) AS rep_3gram_frac,
               ROUND(CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS distinct_word_ratio,
               (1.0 - CAST(n_distinct_3grams AS DOUBLE) / n_3grams > {REP_3GRAM_MAX}
                OR CAST(n_distinct_words AS DOUBLE) / n_words < {DISTINCT_WORD_MIN}) AS flagged
        FROM scored
        ORDER BY doc_id
    """,
)
def curation_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition quality signals (Gopher-style): the
    fraction of 3-gram occurrences that are repeats and the distinct-word
    ratio, plus the keep/drop flag a C4-style cleaning pass would apply.

    Scale: every metric is a pure row-local array expression
    (array_distinct/size over the in-row token array) — zero shuffles,
    embarrassingly parallel over any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    sh = F.expr(_SPARK_SHINGLES)
    scored = (
        d.select("doc_id", "lang", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            "lang",
            F.size("w").cast("long").alias("n_words"),
            F.size(F.array_distinct("w")).cast("long").alias("n_distinct_words"),
            F.size(sh).cast("long").alias("n_3grams"),
            F.size(F.array_distinct(sh)).cast("long").alias("n_distinct_3grams"),
        )
    )
    rep = F.lit(1.0) - F.col("n_distinct_3grams").cast("double") / F.col("n_3grams")
    dwr = F.col("n_distinct_words").cast("double") / F.col("n_words")
    return scored.select(
        "doc_id",
        "lang",
        "n_words",
        F.round(rep, 6).alias("rep_3gram_frac"),
        F.round(dwr, 6).alias("distinct_word_ratio"),
        ((rep > REP_3GRAM_MAX) | (dwr < DISTINCT_WORD_MIN)).alias("flagged"),
    ).orderBy("doc_id")


@register(
    "curation_contamination_check",
    tags=("L5", "L2"),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, unnest({_DUCK_SHINGLES}) AS sh
            FROM t WHERE len(w) >= 3
        ),
        probe AS (
            SELECT DISTINCT sh FROM sh WHERE doc_id % {PROBE_MOD} = 0
        ),
        overlap AS (
            SELECT s.doc_id,
                   COUNT(*) AS n_3grams,
                   COUNT(p.sh) AS n_matched
            FROM sh s LEFT JOIN probe p ON s.sh = p.sh
            WHERE s.doc_id % {PROBE_MOD} <> 0
            GROUP BY s.doc_id
        )
        SELECT doc_id, n_3grams, n_matched,
               ROUND(CAST(n_matched AS DOUBLE) / n_3grams, 6) AS overlap_frac
        FROM overlap
        WHERE CAST(n_matched AS DOUBLE) / n_3grams >= 0.05
        ORDER BY overlap_frac DESC, doc_id
    """,
)
def curation_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: distinct 3-grams of a probe set
    (docs with doc_id % {PROBE_MOD} == 0, standing in for an eval
    benchmark) are matched against every training doc; docs sharing ≥5%
    of their 3-grams are reported — the standard n-gram-overlap
    decontamination step before a training run.

    Scale: the probe set is the SMALL side by construction (an eval
    benchmark is KBs against a 100 TB corpus) — broadcast it; the
    training side streams through map-side, grouped only by doc_id.
    No shuffle ever carries the corpus' shingles to a common key."""
    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select("doc_id", F.explode(F.array_distinct(F.expr(_SPARK_SHINGLES))).alias("sh"))
    )
    probe = F.broadcast(
        sh.where(F.col("doc_id") % PROBE_MOD == 0).select("sh").distinct()
        .withColumn("hit", F.lit(1))
    )
    frac = F.col("n_matched").cast("double") / F.col("n_3grams")
    return (
        sh.where(F.col("doc_id") % PROBE_MOD != 0)
        .join(probe, "sh", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_3grams"), F.count("hit").alias("n_matched"))
        .where(frac >= 0.05)
        .select("doc_id", "n_3grams", "n_matched", F.round(frac, 6).alias("overlap_frac"))
        .orderBy(F.col("overlap_frac").desc(), "doc_id")
    )


@register(
    "curation_pack_sequences",
    tags=("L4", "W5"),
    oracle=f"""
        WITH toks AS (
            SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT source, doc_id, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM toks
        )
        SELECT source,
               CAST(FLOOR((cum_tokens - n_tokens) / {CONTEXT_LEN}.0) AS BIGINT) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc
        FROM cum
        GROUP BY source, bin
        ORDER BY source, bin
    """,
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate each source's docs
    in doc_id order and chunk the token stream into {CONTEXT_LEN}-token
    context windows; a doc belongs to the bin its first token lands in.
    Output = per (source, bin) packing manifest.

    Scale: the running sum partitions by source — a per-shard window,
    never a global one. That is how real packing runs: the corpus is
    already sharded, each shard packs independently, and the prefix sum
    within a shard is Spark's standard partitioned window (one shuffle
    on source; a finer shard key caps partition size at any corpus
    scale)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    bin_ = F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(float(CONTEXT_LEN)))
    return (
        cum.select("source", "doc_id", "n_tokens", bin_.alias("bin"))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "bin")
    )


@register(
    "curation_domain_cap",
    tags=("L-sample", "W6"),
    oracle=f"""
        WITH ranked AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {_duck_hex('doc_id', 'cap')}, doc_id
                   ) AS rn
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN rn <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               MIN(CASE WHEN rn <= 25 THEN doc_id END) AS first_kept
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota (anti-over-representation): keep at most 25 docs
    per source, chosen by deterministic hash order — the domain-mixture
    cap every curation recipe applies so one crawl host cannot dominate
    the training mix.

    Scale: one shuffle on source (the window), partial-agg folded on top —
    this variant reports the BEFORE counts per domain too, so every row
    must reach its domain's partition (no group-limit pushdown possible
    by construction). The pure keep-only-capped-rows form is the W6
    idiom with `WHERE rn <= 25` and DOES get WindowGroupLimit —
    sample_stratified_per_label is that shape, CI-asserted. A skewed
    giant domain is rank-only work here: no sort of the domain's payload,
    just the row_number walk."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(hash_hex(F.col("doc_id"), "cap"), "doc_id")
    kept = F.col("rn") <= 25
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.min(F.when(kept, F.col("doc_id"))).alias("first_kept"),
        )
        .orderBy("source")
    )


_EMAIL_RE = "user[0-9]+@example\\.com"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "curation_pii_redaction",
    tags=("L5", "F1"),
    oracle=f"""
        WITH synth AS (
            SELECT doc_id,
                   'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' re: '
                       || substr(text, 1, 40) AS msg
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(msg, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(msg, '{_PHONE_RE}')) AS n_phones,
               regexp_replace(regexp_replace(msg, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM synth
        WHERE doc_id <= 200
        ORDER BY doc_id
    """,
)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: e-mail and phone patterns are counted and replaced
    with typed placeholders. The fixture corpus is synthetic word-soup,
    so the PII is planted deterministically per doc (a real corpus
    arrives with it) — the regexes, counting, and rewrite are the real
    pipeline step; both engines run the same RE2-safe patterns.

    Scale: row-local regexp_replace in whole-stage codegen — zero
    shuffles, streams at scan speed over 100 TB."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    msg = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    synth = d.select("doc_id", msg.alias("msg"))
    # Column-API regexp_extract_all, NOT an F.expr SQL string: the SQL
    # parser unescapes '\.' inside the literal to a bare '.', silently
    # making the COUNT pattern looser than the regexp_replace redaction
    # pattern (counted-but-not-redacted PII). The Column API takes the
    # pattern verbatim, so count and redaction share one exact regex.
    return bounded_sort(
        synth.select(
            "doc_id",
            F.size(F.regexp_extract_all("msg", F.lit(_EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
            F.size(F.regexp_extract_all("msg", F.lit(_PHONE_RE), F.lit(0))).cast("long").alias("n_phones"),
            F.regexp_replace(
                F.regexp_replace("msg", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
            ).alias("redacted"),
        ),
        "doc_id",
        # the plan is exchange-free (row-local regexes over the scan):
        # a bare coalesce(1) would serialize the whole scan — the
        # barrier keeps it parallel and ships only the <=200 rows
        barrier=True,
    )


@register(
    "embedding_quantize_int8",
    tags=("L3", "F4"),
    oracle="""
        WITH ed AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        scaled AS (
            SELECT vec_id, label, e,
                   list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
            FROM ed
        ),
        q AS (
            SELECT vec_id, label, e, scale,
                   list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS INTEGER)) AS qv
            FROM scaled WHERE scale > 0
        )
        SELECT vec_id, label,
               ROUND(scale, 6) AS scale_r,
               array_to_string(qv[1:8], ',') AS q_head,
               ROUND(list_aggregate(
                   list_transform(generate_series(1, len(e)),
                                  i -> abs(e[i] - qv[i] * scale)), 'max'), 6) AS max_err
        FROM q
        ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (the storage/serving format
    for billion-vector ANN indexes): per-vector scale = max|x|/127,
    values round-half-up to [-127, 127]; reports the head of the
    quantized vector and the max reconstruction error.

    floor(x/scale + 0.5) spells round-half-up identically in both
    engines (double-exact), avoiding banker's-rounding divergence.
    q_head is serialized with array_join — the driver's canonicalizer
    hashes scalar columns only (house rule: oracle-checked queries never
    return raw array/struct columns).

    Scale: row-local array math — zero shuffles; 4× smaller vectors is
    the difference between an in-memory and a spilled ANN index at
    10^9 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    ed = emb.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    scaled = ed.withColumn(
        "scale", F.array_max(F.transform("e", lambda x: F.abs(x))) / F.lit(127.0)
    ).where(F.col("scale") > 0)
    q = scaled.withColumn(
        "qv", F.transform("e", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"))
    )
    err = F.zip_with("e", "qv", lambda x, qi: F.abs(x - qi * F.col("scale")))
    return q.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("scale_r"),
        F.array_join(F.slice("qv", 1, 8), ",").alias("q_head"),
        F.round(F.array_max(err), 6).alias("max_err"),
    ).orderBy("vec_id")


N_SHARDS = 8  # export fan-out; at 100 TB this is thousands


def _duck_hexbyte(hex2_sql: str) -> str:
    """DuckDB int value of a 2-char lowercase hex string (no hex→int cast
    exists in DuckDB 1.0, so spell it with ascii arithmetic)."""

    def nib(c: str) -> str:
        return f"(CASE WHEN {c} >= 'a' THEN ascii({c}) - 87 ELSE ascii({c}) - 48 END)"

    return f"({nib(f'substr({hex2_sql}, 1, 1)')} * 16 + {nib(f'substr({hex2_sql}, 2, 1)')})"


@register(
    "curation_shard_export",
    tags=("L-sample", "S4", "S7"),
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, text, n_chars,
                   CAST({_duck_hexbyte(f"substr({_duck_hex('doc_id')}, 1, 2)")} % {N_SHARDS}
                        AS BIGINT) AS shard_id
            FROM documents
        )
        SELECT shard_id, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM assigned GROUP BY shard_id ORDER BY shard_id
    """,
)
def curation_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export: every document is assigned
    shard = md5(doc_id)-byte mod {N_SHARDS}, the corpus is WRITTEN as
    hive-partitioned parquet (one directory per shard — the layout a
    tokenizer/dataloader fleet consumes), re-read via partition
    discovery, and summarized into a per-shard manifest. The oracle
    recomputes the manifest straight from `documents`, so the round trip
    proves the export lost nothing and the assignment is engine- and
    partitioning-independent (hash-derived, not RNG or row-order).

    Scale: assignment is row-local; the write is one shuffle-free
    partitioned scan-write (each task appends to its shards); manifest
    aggregation shuffles O(shards) rows. Readers page in one shard
    directory at a time — partition pruning handles the rest.
    """
    from sql_redshift_etl_spark.sources.queries import _io_dir
    from sql_redshift_etl_spark.sources.readers import read_partitioned
    from sql_redshift_etl_spark.sources.writers import unload_parquet

    d = load_table(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id",
        "text",
        "n_chars",
        (F.conv(F.substring(hash_hex(F.col("doc_id")), 1, 2), 16, 10).cast("long") % N_SHARDS)
        .alias("shard_id"),
    )
    path = _io_dir(sf_dir, "doc_shards")
    unload_parquet(assigned, path, partition_by=["shard_id"])
    back = read_partitioned(spark, path, schema=assigned.schema)
    return bounded_sort(
        back.groupBy(F.col("shard_id").cast("long").alias("shard_id")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("total_words"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ),
        "shard_id",
    )
