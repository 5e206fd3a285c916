"""Text-analysis operators for training-data pipelines (SURVEY.md §2.9
L4/L5): document stats, word frequencies, quality scoring, token
counting, language-ID heuristic, fingerprinting.

Everything is built-in Spark SQL functions over the documents table —
split/explode/filter/aggregate stay in whole-stage codegen, so these
scale to 100 TB of text without Python in the hot path. (Real BPE
tokenizers or fasttext-style LID would be Pandas UDFs — the regex/
marker-word versions here are the SQL-expressible, oracle-checkable
baseline a cleaning pipeline starts from.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.plans.registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# C4-style quality gates — ONE definition shared by the standalone
# quality queries and the end-to-end corpus pipeline (llm/pipeline_e2e),
# on both engine sides, so a threshold change cannot silently diverge.
QUALITY_LANGS = ("en", "de", "fr", "es")
QUALITY_MIN_CHARS, QUALITY_MAX_CHARS, QUALITY_MIN_WORDS = 100, 450, 30


def quality_predicate() -> F.Column:
    """Spark form of the quality gate (allowed langs, length band,
    minimum word count)."""
    return (
        F.col("lang").isin(*QUALITY_LANGS)
        & F.col("n_chars").between(QUALITY_MIN_CHARS, QUALITY_MAX_CHARS)
        & (F.size(F.split("text", " ")) >= QUALITY_MIN_WORDS)
    )


def quality_where_sql() -> str:
    """DuckDB WHERE-fragment twin of quality_predicate()."""
    langs = ", ".join(f"'{lang}'" for lang in QUALITY_LANGS)
    return (
        f"lang IN ({langs}) "
        f"AND n_chars BETWEEN {QUALITY_MIN_CHARS} AND {QUALITY_MAX_CHARS} "
        f"AND len(string_split(text, ' ')) >= {QUALITY_MIN_WORDS}"
    )

# Marker words per language for the n-gram/keyword LID heuristic.
LID_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "fast", "query"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "una"),
    "fr": ("le", "les", "et"),
}


def _words(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


@register(
    "text_doc_stats_by_lang",
    tags=("L4",),
    bench=True,
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
               CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_words,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY lang
    """,
)
def text_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language (L4) — the first query of any
    data-quality audit. Integer sums → exact across engines."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(_words())
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_words).cast("long").alias("total_words"),
        (F.sum(n_words).cast("double") / F.count(F.lit(1))).alias("avg_words"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_word_freq_topk",
    tags=("L4",),
    oracle="""
        SELECT word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY freq DESC, word ASC
        LIMIT 20
    """,
)
def text_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global word-frequency top-k (L4): explode → count → top-k.

    Scale: explode multiplies rows ~100×, but partial aggregation
    collapses per-partition counts before the shuffle, so the exchange
    carries |vocabulary| rows per partition, not |tokens|.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "text_quality_scores",
    tags=("L5",),
    oracle=f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS type_token_ratio,
               ROUND(CAST(len(list_filter(string_split(text, ' '),
                     w -> list_contains({list(STOPWORDS)!r}, w))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS stopword_ratio,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS avg_word_len,
               (len(string_split(text, ' ')) BETWEEN 30 AND 120
                AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')) >= 0.2) AS keep
        FROM documents
        WHERE doc_id < 200
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality scoring (L5): length bounds, type-token ratio
    (repetition detector), stopword ratio, mean word length, and the
    resulting keep/drop decision."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    words = _words()
    n_words = F.size(words).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    ttr = n_distinct.cast("double") / n_words
    stop_ratio = (
        F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("double") / n_words
    )
    awl = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(awl, 6).alias("avg_word_len"),
        (n_words.between(30, 120) & (ttr >= 0.2)).alias("keep"),
    )


@register(
    "text_quality_filter_kept",
    tags=("L5",),
    oracle=f"""
        SELECT lang, source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        FROM documents
        WHERE {quality_where_sql()}
        GROUP BY lang, source
    """,
)
def text_quality_filter_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter application (L5): language allowlist + length
    bounds (the shared quality_predicate gate), reporting survivors per
    (lang, source) — the shape of a dataset-card yield table."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(quality_predicate())
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )


@register(
    "text_token_counts",
    tags=("L4",),
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS regex_tokens,
               length(text) AS n_chars_actual,
               n_chars AS n_chars_meta
        FROM documents
        WHERE doc_id < 200
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (L4): whitespace tokens + a BPE-ish regex token
    count (letter runs / digit runs / single symbols) — the cheap
    pre-tokenizer estimate used for corpus sizing. Also surfaces that
    n_chars metadata ≠ length(text) on the fixtures."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(_words()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))
        .cast("long")
        .alias("regex_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_meta"),
    )


def _lid_score_sql(markers: tuple[str, ...]) -> str:
    return f"len(list_filter(string_split(text, ' '), w -> list_contains({list(markers)!r}, w)))"


@register(
    "text_lang_id_heuristic",
    tags=("L4",),
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_lid_score_sql(LID_MARKERS["en"])} AS s_en,
                   {_lid_score_sql(LID_MARKERS["de"])} AS s_de,
                   {_lid_score_sql(LID_MARKERS["es"])} AS s_es,
                   {_lid_score_sql(LID_MARKERS["fr"])} AS s_fr
            FROM documents
        )
        SELECT doc_id, lang AS lang_meta,
               CASE
                   WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
                   WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                   WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                   WHEN s_es >= s_fr THEN 'es'
                   ELSE 'fr'
               END AS lang_pred
        FROM scored
        WHERE doc_id < 300
    """,
)
def text_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (L4): per-language keyword hit counts with
    a deterministic argmax tiebreak (en > de > es > fr > unknown).
    The production path swaps markers for character-n-gram profiles —
    same argmax scaffold, still UDF-free."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    words = _words()

    def score(markers: tuple[str, ...]) -> F.Column:
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    s_en, s_de, s_es, s_fr = (score(LID_MARKERS[k]) for k in ("en", "de", "es", "fr"))
    pred = (
        F.when((s_en == 0) & (s_de == 0) & (s_es == 0) & (s_fr == 0), "unknown")
        .when((s_en >= s_de) & (s_en >= s_es) & (s_en >= s_fr), "en")
        .when((s_de >= s_es) & (s_de >= s_fr), "de")
        .when(s_es >= s_fr, "es")
        .otherwise("fr")
    )
    return d.select("doc_id", F.col("lang").alias("lang_meta"), pred.alias("lang_pred"))


@register(
    "text_fingerprints",
    tags=("L4", "L1"),
    oracle="""
        SELECT doc_id,
               md5(text) AS content_fp,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS bag_fp,
               substr(md5(text), 1, 8) AS short_fp
        FROM documents
        WHERE doc_id < 300
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (L4): exact content hash + order-insensitive
    bag-of-words hash (the normalization step of exact dedup). md5 is
    identical across engines, making fingerprints oracle-checkable —
    unlike xxhash64/FNV whose values are engine-specific."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    content_fp = F.md5(F.col("text").cast("binary"))
    bag = F.array_join(F.array_sort(F.array_distinct(_words())), " ")
    return d.select(
        "doc_id",
        content_fp.alias("content_fp"),
        F.md5(bag.cast("binary")).alias("bag_fp"),
        F.substring(content_fp, 1, 8).alias("short_fp"),
    )


@register(
    "text_bigram_lm_score",
    tags=("L4", "L5"),
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        tok AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                                         i -> array_to_string(w[i:i+1], ' '))) AS bg
            FROM t
        ),
        corpus AS (SELECT bg, COUNT(*) AS c FROM tok GROUP BY bg),
        tot AS (SELECT COUNT(*) AS n_total FROM tok),
        scored AS (
            SELECT doc_id, ln(c) - ln(n_total) AS logp
            FROM tok JOIN corpus USING (bg), tot
        )
        SELECT doc_id, COUNT(*) AS n_bigrams,
               ROUND(SUM(logp) / COUNT(*), 6) AS avg_logp
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM score per document (L4/L5) — the
    SQL-expressible stand-in for perplexity filtering: documents whose
    bigrams are rare under the corpus distribution score low and get
    culled. avg_logp = mean over doc bigrams of ln(count(bigram)/N).

    Scale: bigram extraction is row-local (one explode); the count table
    shuffles on bigram (O(vocab²) keys, heavy-tailed — AQE skew split
    applies); the score join re-shuffles tokens on bigram and folds back
    to O(docs). No Python, no collect; a real LM swap-in would replace
    `corpus` with a broadcast n-gram table and keep the same plan.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> array_join(slice(w, i, 2), ' '))"
            ).alias("bg"),
        )
    )
    tokens = docs.select("doc_id", F.explode("bg").alias("bg"))
    corpus = tokens.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    totals = tokens.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tokens.join(corpus, "bg")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (F.log(F.col("c").cast("double")) - F.log(F.col("n_total").cast("double"))).alias(
                "logp"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("logp") / F.count(F.lit(1)), 6).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_tfidf_top_terms",
    tags=("L4",),
    oracle="""
        WITH words AS (
            SELECT doc_id, len(string_split(text, ' ')) AS n_words,
                   unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, n_words, term, COUNT(*) AS cnt
            FROM words GROUP BY doc_id, n_words, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, tf.term,
                   ROUND((CAST(cnt AS DOUBLE) / n_words)
                         * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
            FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term ASC) AS term_rank
            FROM scored
        )
        SELECT doc_id, term, tfidf, term_rank
        FROM ranked WHERE term_rank <= 3
        ORDER BY doc_id, term_rank
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive terms by TF-IDF (L4) — keyword
    extraction / topic tagging over the corpus: tf = term count / doc
    length, idf = ln(N / doc-frequency), ranked per doc on the ROUNDED
    score with a term tiebreak so the ordering is engine-stable.

    Scale: one explode (row-local doc length travels with it), a
    (doc,term) partial-agg shuffle that collapses tokens before the
    exchange, a vocabulary-sized df aggregate that BROADCASTS back to
    the tf table (vocab ≪ corpus), and one per-doc window. No corpus-
    sized non-equi join anywhere; every shuffle key is high-cardinality.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.size(_words()).alias("n_words"), F.explode(_words()).alias("term")
    )
    tf = base.groupBy("doc_id", "n_words", "term").agg(F.count(F.lit(1)).alias("cnt"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("cnt").cast("double") / F.col("n_words"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.select(
            "doc_id", "term", "tfidf", F.row_number().over(w).cast("long").alias("term_rank")
        )
        .where(F.col("term_rank") <= 3)
        .orderBy("doc_id", "term_rank")
    )


@register(
    "text_approx_topk_words",
    tags=("L4", "A3"),
    oracle="""
        SELECT word, cnt
        FROM (
            SELECT word, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            GROUP BY word
            ORDER BY cnt DESC, word ASC
            LIMIT 20
        )
        ORDER BY cnt DESC, word ASC
    """,
)
def text_approx_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent items (heavy hitters) via Spark 4's
    ``approx_top_k`` sketch: one pass, fixed memory (maxItemsTracked
    entries per partial), mergeable partials — the frequent-items
    posture that survives a 100 TB corpus where an exact global
    count-all-then-sort pays a |vocabulary|-row shuffle per partition.
    Fixture vocabulary (31 words) < maxItemsTracked, so the sketch is
    provably in its exact regime and the DuckDB oracle checks FULL
    values, not just shape; at web-corpus vocabularies it degrades to
    the documented ε-approximate counts. The rank-20/21 boundary counts
    differ in the fixture, so the top-20 set is unique (no tie
    ambiguity in the hash).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_words()).alias("word"))
        .agg(F.expr("approx_top_k(word, 20, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
    )
