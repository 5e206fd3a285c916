"""Registered source/sink round-trip queries (SURVEY.md §2.1 S2/S4/S7).

Each builder exercises a real write→read cycle through a scratch
directory (the COPY / UNLOAD lifecycle), then aggregates the re-read
data; the oracle runs the same aggregate on the original table — equal
results prove the round-trip is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import bounded_sort, load_table
from sql_redshift_etl_spark.functions.dialect import dsum
from sql_redshift_etl_spark.plans.registry import register
from sql_redshift_etl_spark.sources.readers import read_csv, read_json_lines, read_partitioned
from sql_redshift_etl_spark.sources.writers import unload_csv, unload_parquet

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "_scratch", "io")


def _io_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_SCRATCH, tag, name)


@register(
    "source_csv_copy_roundtrip",
    tags=("S2",),
    oracle="""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
)
def source_csv_copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY FORMAT CSV (S2): UNLOAD documents → CSV files → COPY back with
    an explicit schema → aggregate. Oracle on the original table proves
    losslessness (quoting/escaping of free text included)."""
    path = _io_dir(sf_dir, "docs_csv")
    d = load_table(spark, sf_dir, "documents")
    unload_csv(d, path)
    back = read_csv(
        spark, path, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "source_json_copy_roundtrip",
    tags=("S2",),
    oracle="""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words
        FROM documents
        GROUP BY source
    """,
)
def source_json_copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY FORMAT JSON (S2): newline-delimited JSON round-trip with
    explicit schema (PERMISSIVE mode), then per-source aggregation."""
    path = _io_dir(sf_dir, "docs_json")
    d = load_table(spark, sf_dir, "documents")
    d.write.mode("overwrite").json(path)
    back = read_json_lines(
        spark, path, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_words"),
    )


@register(
    "source_unload_partitioned",
    tags=("S4", "S7"),
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def source_unload_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNLOAD → hive-partitioned parquet → partitioned ingest (S4+S7):
    orders written partitionBy(o_orderstatus) with SORTKEY-style
    sortWithinPartitions(o_orderdate), re-read via basePath discovery.

    Scale: this layout is what makes events_incremental_load's watermark
    predicate become partition pruning (zero I/O on old partitions), and
    min/max page skipping on the sort key inside each file.
    """
    path = _io_dir(sf_dir, "orders_part")
    o = load_table(spark, sf_dir, "orders")
    unload_parquet(o, path, partition_by=["o_orderstatus"], sort_within=["o_orderdate"])
    back = read_partitioned(spark, path, schema=o.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2, 8).alias("total_price")
    )


@register(
    "source_bucketed_distkey_join",
    tags=("S6", "J1", "J7"),
    oracle="""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
)
def source_bucketed_distkey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTKEY co-located join (Redshift DISTSTYLE KEY → Spark bucketing):
    orders and lineitem persisted as managed tables bucketed 8-ways on
    the order key (writers.write_bucketed_table), then fact-fact joined.
    Because both sides hash-partition identically on disk, the join plans
    with ZERO pre-join exchanges (CI-asserted) — the co-located-join
    property that makes the biggest recurring join in a warehouse
    shuffle-free forever, amortizing one bucketed write across every
    downstream query.

    Scale: at 100 TB pick num_buckets ≈ cluster cores × small multiple;
    bucket pruning + sorted buckets additionally give merge-join locality
    on the sort key. Oracle joins the ORIGINAL tables — equal results
    prove the bucketed round-trip is lossless too."""
    from sql_redshift_etl_spark.functions.dialect import money
    from sql_redshift_etl_spark.sources.writers import write_bucketed_table

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_li = f"bk_orders_{tag}", f"bk_lineitem_{tag}"
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        t_orders,
        bucket_by=["o_orderkey"],
        num_buckets=8,
        sort_by=["o_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        t_li,
        bucket_by=["l_orderkey"],
        num_buckets=8,
        sort_by=["l_orderkey"],
    )
    o, li = spark.table(t_orders), spark.table(t_li)
    return bounded_sort(
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(money("l_extendedprice")).cast("double").alias("total_price"),
        ),
        "o_orderpriority",
    )


@register(
    "source_jdbc_roundtrip",
    tags=("S3", "S5"),
    oracle="""
        SELECT n.n_name, COUNT(*) AS n_suppliers,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE JDBC round trip (S3 sink + S5 source) — no longer wiring-only:
    Spark bundles Apache Derby (its Hive-metastore backend), so an
    embedded ``jdbc:derby:memory:`` database gives a real JDBC server
    round trip with zero network. supplier is published through the S5
    sink (batched INSERTs), pulled back through the S3 source as a
    PARTITIONED read (8 parallel range scans on s_suppkey — the
    warehouse-scale pull shape), joined to nation and aggregated; the
    oracle on the original table proves the round trip lossless.

    Against a real Redshift/Postgres the SAME builders run with only the
    URL changed — the embedded engine exercises every code path except
    the socket. Scale: the partitioned read is the 100 TB-relevant part
    (N parallel range scans, each a separate task); the sink stays a
    dimension-publish path (bulk facts go UNLOAD→COPY, BASELINE.md).
    """
    import os

    from sql_redshift_etl_spark.sources.readers import read_jdbc
    from sql_redshift_etl_spark.sources.writers import write_jdbc

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    url = f"jdbc:derby:memory:rt_{tag};create=true"
    sup = load_table(spark, sf_dir, "supplier")
    write_jdbc(sup, url=url, table="supplier_rt", mode="overwrite")
    bounds = sup.agg(F.min("s_suppkey"), F.max("s_suppkey")).first()
    if bounds[0] is None:  # empty input: unpartitioned read of the empty table
        back = read_jdbc(spark, url=url, table_or_query="supplier_rt")
    else:
        back = read_jdbc(
            spark,
            url=url,
            table_or_query="supplier_rt",
            partition_column="s_suppkey",
            lower_bound=int(bounds[0]),
            upper_bound=int(bounds[1]) + 1,
            num_partitions=8,
        )
    nat = load_table(spark, sf_dir, "nation")
    return (
        back.join(F.broadcast(nat), back.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), dsum("s_acctbal", 2, 8).alias("total_bal"))
    )


_SCRIPT_EXTERNAL = """
    UNLOAD ('SELECT doc_id, n_chars, lang FROM {docs}')
    TO '{out}' FORMAT AS PARQUET PARTITION BY (lang) ALLOWOVERWRITE;

    CREATE EXTERNAL TABLE ext_docs (doc_id BIGINT, n_chars BIGINT)
    PARTITIONED BY (lang VARCHAR(8))
    STORED AS PARQUET
    LOCATION '{out}';

    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ext_docs
    GROUP BY 1;
"""


@register(
    "source_external_table",
    tags=("S7", "S1", "A1"),
    oracle="""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
)
def source_external_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redshift Spectrum analog (r5): UNLOAD writes a lang-partitioned
    parquet prefix, CREATE EXTERNAL TABLE binds it schema-on-read with
    the partition column declared via PARTITIONED BY, and the rollup
    over the external hash-matches the direct-on-documents oracle —
    proving the external's column validation, hive partition discovery,
    and the partition column's values all round-trip.

    Scale: the external is exactly a Spark scan — filters on the
    PARTITIONED BY column become static partition pruning over the
    prefix layout, the same mechanism sim_ann_lsh_pruned CI-asserts.
    """
    from sql_redshift_etl_spark.functions.script_runner import run_redshift_script

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("rs_ext_docs")
    out = run_redshift_script(
        spark,
        _SCRIPT_EXTERNAL.format(docs="rs_ext_docs", out=_io_dir(sf_dir, "external_docs")),
    )
    assert out is not None
    return out


@register(
    "source_fixedwidth_copy_roundtrip",
    tags=("S2",),
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nation GROUP BY 1
    """,
)
def source_fixedwidth_copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY FIXEDWIDTH (S2, r6): nation rendered to space-padded
    fixed-width lines (format_string), loaded back through the verbatim
    ``COPY ... FIXEDWIDTH 'label:width,...'`` script statement, and
    aggregated — the oracle on the original table proves the column
    cuts, right-trim, and casts are lossless.

    Scale: line-oriented text input is splittable; the cuts are
    codegen'd row-local substrings — identical posture to the CSV path.
    """
    from sql_redshift_etl_spark.functions.script_runner import run_redshift_script

    path = _io_dir(sf_dir, "nation_fixedwidth")
    nat = load_table(spark, sf_dir, "nation")
    nat.select(
        F.format_string("%-6d%-12s%-4d", "n_nationkey", "n_name", "n_regionkey").alias(
            "value"
        )
    ).coalesce(1).write.mode("overwrite").text(path)
    out = run_redshift_script(
        spark,
        f"""
        CREATE TEMP TABLE nat_fw (
            n_nationkey BIGINT, n_name VARCHAR(12), n_regionkey BIGINT);
        COPY nat_fw FROM '{path}'
            FIXEDWIDTH 'n_nationkey:6,n_name:12,n_regionkey:4';
        SELECT n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nat_fw GROUP BY n_regionkey;
        """,
    )
    assert out is not None
    return out


@register(
    "source_copy_jsonpaths",
    tags=("S2",),
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nation GROUP BY 1
    """,
)
def source_copy_jsonpaths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY ... FORMAT AS JSON '<jsonpaths>' (S2, r13 — VERDICT r12
    "what's missing" #2, the last COPY form without a handler): nation
    rendered as NESTED JSON documents (``{"key": {"id": ..}, "attrs":
    {"name": .., "region": ..}}``), loaded back through a jsonpaths
    control file that reshapes the nesting into flat columns — one dot
    path and one bracket path, so both public spellings are gated —
    then aggregated. The oracle on the original table proves the
    positional path mapping, bracket normalization, and casts are
    lossless.

    Scale: line-oriented text scan (splittable) + row-local codegen'd
    get_json_object per path — same single-pass shape as plain COPY;
    the control file is driver-side metadata like a manifest.
    """
    import json

    from sql_redshift_etl_spark.functions.script_runner import run_redshift_script

    data = _io_dir(sf_dir, "nation_jsonpaths")
    nat = load_table(spark, sf_dir, "nation")
    nat.select(
        F.to_json(
            F.struct(
                F.struct(F.col("n_nationkey").alias("id")).alias("key"),
                F.struct(
                    F.col("n_name").alias("name"),
                    F.col("n_regionkey").alias("region"),
                ).alias("attrs"),
            )
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(data)
    ctl_dir = _io_dir(sf_dir, "nation_jsonpaths_ctl")
    os.makedirs(ctl_dir, exist_ok=True)
    ctl = os.path.join(ctl_dir, "jsonpaths.json")
    with open(ctl, "w", encoding="utf-8") as fh:
        json.dump(
            {"jsonpaths": ["$.key.id", "$['attrs']['name']", "$.attrs.region"]}, fh
        )
    out = run_redshift_script(
        spark,
        f"""
        CREATE TEMP TABLE nat_jp (
            n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT);
        COPY nat_jp FROM '{data}' FORMAT AS JSON '{ctl}';
        SELECT n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
        FROM nat_jp GROUP BY n_regionkey;
        """,
    )
    assert out is not None
    return out


@register(
    "source_copy_jsonpaths_maxerror",
    tags=("S2",),
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
               CAST(3 AS BIGINT) AS n_load_errors
        FROM nation GROUP BY 1
    """,
)
def source_copy_jsonpaths_maxerror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY jsonpaths + MAXERROR (S2, r13 depth — the malformed-record
    contract under the DRIVER hash gate, not just pytest): nation's
    nested documents plus THREE deterministic error records (invalid
    JSON, a bare ``null`` literal, an empty line — the three
    classifications readers.read_json_with_paths documents) loaded
    through the same jsonpaths file with ``MAXERROR 5``. The result
    gates BOTH sides of the budget: every per-region aggregate must be
    untouched by the skipped records (a silently loaded NULL row would
    shift n_nations and break the hash) and the stl_load_errors count
    must be exactly 3 (a record misclassified as good would vanish from
    the budget).

    Scale: same row-local single-pass load as source_copy_jsonpaths
    plus the one cached-scan acceptance count every MAXERROR load pays
    (read_with_error_budget's contract since r6).
    """
    import json

    from sql_redshift_etl_spark.functions.script_runner import run_redshift_script

    data = _io_dir(sf_dir, "nation_jsonpaths_bad")
    nat = load_table(spark, sf_dir, "nation")
    nat.select(
        F.to_json(
            F.struct(
                F.struct(F.col("n_nationkey").alias("id")).alias("key"),
                F.struct(
                    F.col("n_name").alias("name"),
                    F.col("n_regionkey").alias("region"),
                ).alias("attrs"),
            )
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(data)
    # three malformed records in a sibling part file (spark.read.text
    # reads every non-underscore file in the directory): invalid JSON,
    # the bare JSON null literal, and an empty line
    with open(os.path.join(data, "zz_bad_records.txt"), "w", encoding="utf-8") as fh:
        fh.write('{"key": {"id": broken\nnull\n\n')
    ctl_dir = _io_dir(sf_dir, "nation_jsonpaths_bad_ctl")
    os.makedirs(ctl_dir, exist_ok=True)
    ctl = os.path.join(ctl_dir, "jsonpaths.json")
    with open(ctl, "w", encoding="utf-8") as fh:
        json.dump(
            {"jsonpaths": ["$.key.id", "$['attrs']['name']", "$.attrs.region"]}, fh
        )
    out = run_redshift_script(
        spark,
        f"""
        CREATE TEMP TABLE nat_jpb (
            n_nationkey BIGINT, n_name VARCHAR(25), n_regionkey BIGINT);
        COPY nat_jpb FROM '{data}' FORMAT AS JSON '{ctl}' MAXERROR 5;
        SELECT n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name, MAX(n_name) AS last_name,
               CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
               (SELECT COUNT(*) FROM stl_load_errors) AS n_load_errors
        FROM nat_jpb GROUP BY n_regionkey;
        """,
    )
    assert out is not None
    return out


@register(
    "source_copy_conversion_params",
    tags=("S2",),
    oracle="""
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               COUNT(*) AS n_rows,
               COUNT(comment_trimmed) AS n_comments,
               MIN(comment_trimmed) AS first_comment
        FROM (
            SELECT n_regionkey,
                   CASE WHEN n_nationkey % 5 = 0 THEN NULL
                        ELSE 'c-' || CAST(n_nationkey AS VARCHAR) END
                       AS comment_trimmed
            FROM nation
        )
        GROUP BY 1
    """,
)
def source_copy_conversion_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY data-conversion parameters as a driver-checked round trip
    (r6): nation rendered to CSV with every 5th comment a
    whitespace-only field and the rest right-padded, loaded back with
    BLANKSASNULL + TRIMBLANKS, aggregated. The oracle recomputes from
    the base table: matching hashes prove blank→NULL and the rtrim
    both applied (an untrimmed comment would change MIN, an unnulled
    blank would change COUNT(comment)).

    Scale: the conversions are row-local projections inserted before
    the positional cast — same single-pass load as plain COPY.
    """
    from sql_redshift_etl_spark.functions.script_runner import run_redshift_script

    path = _io_dir(sf_dir, "nation_conversion")
    nat = load_table(spark, sf_dir, "nation")
    nat.select(
        F.concat_ws(
            ",",
            F.col("n_nationkey"),
            F.col("n_regionkey"),
            F.when(F.col("n_nationkey") % 5 == 0, F.lit("   ")).otherwise(
                F.rpad(F.concat(F.lit("c-"), F.col("n_nationkey")), 12, " ")
            ),
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)
    out = run_redshift_script(
        spark,
        f"""
        CREATE TEMP TABLE nat_cv (
            n_nationkey BIGINT, n_regionkey BIGINT, comment_trimmed VARCHAR(12));
        COPY nat_cv FROM '{path}' FORMAT AS CSV BLANKSASNULL TRIMBLANKS;
        SELECT n_regionkey, COUNT(*) AS n_rows,
               COUNT(comment_trimmed) AS n_comments,
               MIN(comment_trimmed) AS first_comment
        FROM nat_cv GROUP BY n_regionkey;
        """,
    )
    assert out is not None
    return out
