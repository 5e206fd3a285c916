"""Redshift scalar-function surface as oracle-checked queries
(SURVEY.md §2.7): string, regex, datetime, math, JSON/SUPER, array.

All expressions are built-in Catalyst functions — they stay inside
whole-stage codegen (no Python on the hot path), so at 100 TB these
evaluate at scan speed. Dialect traps (TO_CHAR formats, DATEDIFF
boundary semantics, double→int casts, ROUND half-rules) are routed
through functions.dialect and exercised here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_redshift_etl_spark.catalog import load_table
from sql_redshift_etl_spark.functions.dialect import (
    dec,
    json_extract_path_text,
    redshift_datediff,
    split_part,
    to_char,
)
from sql_redshift_etl_spark.plans.registry import register


@register(
    "string_functions",
    tags=("F1",),
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               array_to_string(
                   list_transform(string_split(p_name, ' '),
                                  w -> upper(w[1]) || lower(w[2:])),
                   ' ') AS name_initcap,
               SUBSTRING(p_name, 1, 4) AS name_prefix,
               STRPOS(p_name, 'widget') AS widget_pos,
               TRIM('  ' || p_name || ' ') AS name_trimmed,
               LPAD(p_brand, 12, '*') AS brand_padded,
               REPLACE(p_name, ' ', '_') AS name_underscored,
               TRANSLATE(p_brand, '#', '-') AS brand_dashed,
               REPEAT('ab', 3) AS repeated,
               REVERSE(p_type) AS type_reversed,
               LENGTH(p_name) AS name_len,
               LEFT(p_type, 3) AS type_left,
               RIGHT(p_type, 3) AS type_right,
               p_name || '/' || p_brand AS name_concat,
               split_part(p_brand, '#', 2) AS brand_num
        FROM part
        WHERE p_partkey <= 100
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: UPPER/LOWER/INITCAP/SUBSTRING/STRPOS/TRIM/LPAD/
    REPLACE/TRANSLATE/REPEAT/REVERSE/LENGTH/LEFT/RIGHT/CONCAT/SPLIT_PART.
    (DuckDB lacks INITCAP — the oracle emulates it with a list lambda.)"""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.initcap("p_name").alias("name_initcap"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.instr("p_name", "widget").cast("long").alias("widget_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_underscored"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.reverse("p_type").alias("type_reversed"),
        F.length("p_name").cast("long").alias("name_len"),
        F.left(F.col("p_type"), F.lit(3)).alias("type_left"),
        F.right(F.col("p_type"), F.lit(3)).alias("type_right"),
        F.concat_ws("/", "p_name", "p_brand").alias("name_concat"),
        split_part("p_brand", "#", 2).alias("brand_num"),
    )


@register(
    "regex_functions",
    tags=("F1",),
    oracle="""
        SELECT doc_id,
               regexp_extract(text, '([a-z]+)', 1) AS first_word,
               len(regexp_extract_all(text, 'data')) AS n_data,
               regexp_replace(text, ' +', '_', 'g') AS squashed,
               regexp_matches(text, '^the ') AS starts_the
        FROM documents
        WHERE doc_id < 100
    """,
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_SUBSTR/COUNT/REPLACE + regex match (Redshift ~ operator).
    Patterns kept to the RE2∩Java-regex common subset so both engines
    agree (SURVEY §4 regex-dialect trap)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit("data")).cast("long").alias("n_data"),
        F.regexp_replace("text", " +", "_").alias("squashed"),
        F.col("text").rlike("^the ").alias("starts_the"),
    )


@register(
    "datetime_functions",
    tags=("F1", "E1"),
    oracle="""
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS order_month,
               date_trunc('week', o_orderdate) AS order_week,
               EXTRACT(year FROM o_orderdate) AS yr,
               EXTRACT(month FROM o_orderdate) AS mon,
               EXTRACT(day FROM o_orderdate) AS dom,
               EXTRACT(dow FROM o_orderdate) + 1 AS dow_sunday1,
               EXTRACT(doy FROM o_orderdate) AS doy,
               last_day(CAST(o_orderdate AS DATE)) + INTERVAL 0 DAY AS month_end,
               CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS due_ts,
               o_orderdate + INTERVAL 3 MONTH AS plus3m
        FROM orders
        WHERE o_orderkey <= 500
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE_TRUNC / EXTRACT / LAST_DAY / DATEADD surface.

    DOW alignment: Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday —
    oracle shifts by +1. Date arithmetic returns timestamps on both sides
    (DATE-typed outputs don't survive pandas comparison uniformly).

    Oracle gotcha: DuckDB 1.0.0 mis-CSEs two different `<date-expr> +
    INTERVAL` additions over the SAME operand expression (both evaluate
    to the first interval!) — the oracle adds the 3-month interval to the
    raw timestamp instead of the CAST(... AS DATE) operand to keep the
    two additions distinct.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.date_trunc("week", "o_orderdate").alias("order_week"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.dayofweek("o_orderdate").cast("long").alias("dow_sunday1"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.date_add(d, 90).cast("timestamp_ntz").alias("due_ts"),
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus3m"),
    )


@register(
    "datediff_boundary_semantics",
    tags=("F1",),
    oracle="""
        SELECT o_orderkey,
               date_diff('year',  CAST(o_orderdate AS DATE), DATE '2000-01-01') AS years_to_y2k,
               date_diff('month', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS months_to_y2k,
               date_diff('day',   CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
               date_diff('quarter', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS quarters_to_y2k,
               date_diff('week',  CAST(o_orderdate AS DATE), DATE '2000-01-01') AS weeks_to_y2k
        FROM orders
        WHERE o_orderkey <= 500
    """,
)
def datediff_boundary_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redshift DATEDIFF counts *boundary crossings*, not elapsed units
    (DATEDIFF(year, '1999-12-31', '2000-01-01') = 1) — the §4 dialect
    trap. functions.dialect.redshift_datediff reproduces it; DuckDB's
    date_diff shares the convention, giving an exact oracle."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    y2k = F.lit("2000-01-01").cast("date")
    return o.select(
        "o_orderkey",
        redshift_datediff("year", F.col("o_orderdate"), y2k).cast("long").alias("years_to_y2k"),
        redshift_datediff("month", F.col("o_orderdate"), y2k).cast("long").alias("months_to_y2k"),
        redshift_datediff("day", F.col("o_orderdate"), y2k).cast("long").alias("days_to_y2k"),
        redshift_datediff("quarter", F.col("o_orderdate"), y2k).cast("long").alias("quarters_to_y2k"),
        # week unit: Monday-boundary crossings, integral (r01 VERDICT #5)
        redshift_datediff("week", F.col("o_orderdate"), y2k).alias("weeks_to_y2k"),
    )


@register(
    "to_char_formats",
    tags=("F1",),
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d') AS iso_day,
               upper(strftime(ts, '%b %d, %Y')) AS pretty_date,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_ts,
               strftime(ts, '%H') AS hour24
        FROM events
        WHERE event_id < 200
    """,
)
def to_char_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_CHAR with Redshift (Postgres-style) format strings — the
    dialect layer translates 'YYYY-MM-DD' → 'yyyy-MM-dd' etc.
    (functions.dialect.translate_datetime_format)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        to_char("ts", "YYYY-MM-DD").alias("iso_day"),
        to_char("ts", "MON DD, YYYY").alias("pretty_date"),
        to_char("ts", "YYYY-MM-DD HH24:MI:SS").alias("iso_ts"),
        to_char("ts", "HH24").alias("hour24"),
    )


@register(
    "math_functions",
    tags=("F1",),
    oracle="""
        SELECT o_orderkey,
               ABS(-o_totalprice) AS abs_price,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
               CAST(CEIL(o_totalprice) AS BIGINT) AS ceil_price,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS round_dec_1,
               o_orderkey % 7 AS key_mod,
               CAST(SIGN(o_totalprice - 250000) AS DOUBLE) AS above_median,
               ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
               ROUND(LN(o_totalprice), 6) AS ln_price,
               ROUND(LOG10(o_totalprice), 6) AS log10_price,
               ROUND(POWER(o_orderkey % 9, 2), 1) AS key_sq,
               ROUND(EXP(1.0), 6) AS e_const
        FROM orders
        WHERE o_orderkey <= 500
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface. ROUND on raw doubles is a dialect trap (Spark rounds
    the shortest decimal repr, DuckDB the binary value) — so rounding goes
    through DECIMAL; transcendentals (LN/EXP/POWER) can differ by 1 ulp
    between libm implementations, absorbed by ROUND(...,6)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.abs(-F.col("o_totalprice")).alias("abs_price"),
        F.floor("o_totalprice").cast("bigint").alias("floor_price"),
        F.ceil("o_totalprice").cast("bigint").alias("ceil_price"),
        F.round(dec("o_totalprice"), 1).cast("double").alias("round_dec_1"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("o_totalprice") - 250000).alias("above_median"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.log("o_totalprice"), 6).alias("ln_price"),
        F.round(F.log10("o_totalprice"), 6).alias("log10_price"),
        F.round(F.pow(F.col("o_orderkey") % 9, 2), 1).alias("key_sq"),
        F.round(F.exp(F.lit(1.0)), 6).alias("e_const"),
    )


@register(
    "json_super_access",
    tags=("F1",),
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
               json_extract_string(props, '$.missing') AS missing_key,
               (props IS NOT NULL AND json_valid(props)) AS is_valid
        FROM events
        WHERE event_id < 500
    """,
)
def json_super_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPER/JSON access (Redshift JSON_EXTRACT_PATH_TEXT / PartiQL dotted
    paths) → get_json_object. Missing keys yield NULL, not error — same
    contract as Redshift's lax SUPER navigation.

    Scale: get_json_object is a codegen'd JVM expression; for repeated
    multi-key access prefer one from_json(schema) per row (single parse).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    k = json_extract_path_text("props", "k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
        json_extract_path_text("props", "missing").alias("missing_key"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "json_from_json_struct",
    tags=("F1",),
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY k_bucket
    """,
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse (from_json → struct) then relational ops on the
    extracted field — the SUPER→typed-column ETL pattern. One parse per
    row regardless of how many fields are consumed."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k BIGINT"))
    return (
        parsed.groupBy((F.col("p.k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "partiql_nested_objects",
    tags=("F1",),
    oracle="""
        WITH item AS (
            SELECT l_orderkey AS okey, l_linenumber,
                   '{"ln": ' || l_linenumber || ', "sku": ' || l_partkey
                   || ', "qty": ' || CAST(l_quantity AS BIGINT) || '}' AS ij
            FROM lineitem WHERE l_orderkey <= 400
        ), doc AS (
            -- tie-break on the item text: the fixture has duplicate
            -- (orderkey, linenumber) pairs, and Spark's array_sort over
            -- struct(ln, ij) breaks ln ties on the ij string
            -- ordinal-domain guard (ADVICE r12): generate_series(1, 64)
            -- below is a CONSTANT domain; if a larger fixture tier ever
            -- grew an order past 64 items the oracle would silently drop
            -- the overflow rows and the gate would fail as an
            -- undiagnosable hash mismatch. Fail loudly with the reason
            -- instead (error() is lazy inside CASE — zero cost in-domain).
            SELECT okey,
                   CASE WHEN COUNT(*) > 64 THEN error(
                       'partiql_nested_objects oracle: an order exceeds the '
                       || '64-ordinal generate_series domain - widen it')
                   ELSE '{"order": ' || okey || ', "items": ['
                   || string_agg(ij, ', ' ORDER BY l_linenumber, ij) || ']}'
                   END AS d
            FROM item GROUP BY okey
        )
        SELECT okey AS o_orderkey,
               CAST(json_extract(d, '$.order') AS BIGINT) AS order_id,
               CAST(json_array_length(d, '$.items') AS BIGINT) AS n_items,
               CAST(json_extract(d, '$.items[0].sku') AS BIGINT) AS first_sku,
               CAST(g.i - 1 AS BIGINT) AS pos,
               CAST(json_extract(d, '$.items[' || (g.i - 1) || '].sku') AS BIGINT) AS sku,
               CAST(json_extract(d, '$.items[' || (g.i - 1) || '].qty') AS BIGINT) AS qty
        -- DuckDB cannot lateral-join generate_series on a column, so a
        -- constant ordinal domain is filtered by the real array length
        -- (the fixture's duplicate linenumbers make up to 13 items per
        -- order at sf0.01; 64 leaves headroom)
        FROM doc, generate_series(1, 64) AS g(i)
        WHERE g.i <= json_array_length(d, '$.items')
    """,
)
def partiql_nested_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PartiQL navigation into ARRAYS OF OBJECTS (VERDICT r11 item 5 —
    the last common Redshift-SUPER idiom: ``props.items[0].sku``-style
    paths). A nested JSON document is built per order from its
    lineitems (both engines construct byte-identical text, so the
    navigation — not the construction — is what the hash gates), then
    accessed three ways a SUPER user does: a scalar object field
    (``doc.order``), a head element through the array
    (``doc.items[0].sku``), and full array-of-objects iteration with
    ordinals (``FROM doc.items AS item AT pos`` ≡ from_json +
    posexplode). The DuckDB oracle replays every path with
    json_extract over the same documents.

    Scale: ONE shuffle (the per-order groupBy that assembles the
    document — at 100 TB that is the unavoidable gather of an order's
    lines); from_json parses each document ONCE per row for all
    extracted fields, and posexplode is a row-local Generate. The
    ordinal filter lives in the oracle only — Spark's explode never
    over-produces.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    item = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("ln"),
        F.concat(
            F.lit('{"ln": '),
            F.col("l_linenumber").cast("string"),
            F.lit(', "sku": '),
            F.col("l_partkey").cast("string"),
            F.lit(', "qty": '),
            F.col("l_quantity").cast("bigint").cast("string"),
            F.lit("}"),
        ).alias("ij"),
    )
    docs = (
        item.groupBy("okey")
        .agg(F.array_sort(F.collect_list(F.struct("ln", "ij"))).alias("items"))
        .select(
            "okey",
            F.concat(
                F.lit('{"order": '),
                F.col("okey").cast("string"),
                F.lit(', "items": ['),
                F.array_join(F.transform("items", lambda x: x["ij"]), ", "),
                F.lit("]}"),
            ).alias("doc"),
        )
    )
    parsed = docs.select(
        "okey",
        F.from_json(
            "doc",
            "`order` BIGINT, items ARRAY<STRUCT<ln: BIGINT, sku: BIGINT, qty: BIGINT>>",
        ).alias("p"),
    )
    return parsed.select(
        F.col("okey").alias("o_orderkey"),
        F.col("p.order").alias("order_id"),
        F.size("p.items").cast("bigint").alias("n_items"),
        # F.get, not [0]: Redshift SUPER navigation is LAX — an
        # out-of-bounds index yields NULL (missing-element contract),
        # never an ANSI index error. Unreachable here (every order in
        # the filter has >= 1 lineitem) but load-bearing in the fuzz
        # battery's empty-array documents.
        F.get("p.items", 0).getField("sku").alias("first_sku"),
        F.posexplode("p.items").alias("pos", "item"),
    ).select(
        "o_orderkey",
        "order_id",
        "n_items",
        "first_sku",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("item.sku").alias("sku"),
        F.col("item.qty").alias("qty"),
    )


@register(
    "partiql_object_unpivot",
    tags=("F1",),
    oracle="""
        WITH agg AS (
            SELECT l_orderkey AS okey,
                   l_returnflag || ' ' || l_linestatus AS attr,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem WHERE l_orderkey <= 600
            GROUP BY 1, 2
        ), doc AS (
            SELECT okey,
                   '{' || string_agg('"' || attr || '": ' || qty,
                                     ', ' ORDER BY attr) || '}' AS d
            FROM agg GROUP BY okey
        ), kv AS (
            -- the dynamic replay: json_keys enumerates whatever keys THIS
            -- document has (no static attribute list), and the extraction
            -- path is double-quoted because every key ("A F", "N O", ...)
            -- carries a space
            SELECT okey, d, unnest(json_keys(d)) AS k FROM doc
        )
        SELECT okey AS o_orderkey,
               k AS attr,
               CAST(json_extract(d, '$."' || k || '"') AS BIGINT) AS qty,
               CAST(len(json_keys(d)) AS BIGINT) AS n_attrs
        FROM kv
    """,
)
def partiql_object_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PartiQL OBJECT unpivot (VERDICT r12 optional depth item — the one
    remaining PartiQL iteration form after r12's arrays-of-objects):
    Redshift's ``SELECT attr, val FROM t, UNPIVOT t.doc AS val AT attr``
    iterates a SUPER object's key/value pairs with the key exposed as a
    column. A per-order JSON object is built mapping each (returnflag,
    linestatus) state the order's lines hit to their total quantity
    (keys VARY per document, and every key — ``"A F"``, ``"N O"`` … —
    carries a space, so static enumeration cannot fake the iteration
    and the quoted-path spelling is load-bearing), then unpivoted
    Spark-side as ``from_json`` to
    ``MAP<STRING, BIGINT>`` + ``explode`` (key → AT attribute, value →
    AS value). The DuckDB oracle replays dynamically via json_keys +
    unnest + quoted-path json_extract over byte-identical documents.

    Scale: a two-level aggregation — the (okey, attr) sum exchanges on
    its compound key (map-side partials first), then the per-order
    object assembly exchanges on okey over the already-reduced rows
    (≤ a few entries per order); both are unavoidable gathers at
    100 TB. from_json parses each document once, explode(map) is a
    row-local Generate — same posture as partiql_nested_objects.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 600)
    agg = (
        li.groupBy(
            F.col("l_orderkey").alias("okey"),
            F.concat_ws(" ", "l_returnflag", "l_linestatus").alias("attr"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    docs = (
        agg.groupBy("okey")
        .agg(F.array_sort(F.collect_list(F.struct("attr", "qty"))).alias("kvs"))
        .select(
            "okey",
            F.concat(
                F.lit("{"),
                F.array_join(
                    F.transform(
                        "kvs",
                        lambda x: F.concat(
                            F.lit('"'),
                            x["attr"],
                            F.lit('": '),
                            x["qty"].cast("string"),
                        ),
                    ),
                    ", ",
                ),
                F.lit("}"),
            ).alias("doc"),
        )
    )
    parsed = docs.select("okey", F.from_json("doc", "MAP<STRING, BIGINT>").alias("m"))
    return parsed.select(
        F.col("okey").alias("o_orderkey"),
        F.size("m").cast("bigint").alias("n_attrs"),
        F.explode("m").alias("attr", "qty"),
    ).select("o_orderkey", "attr", "qty", "n_attrs")


@register(
    "array_functions",
    tags=("F1", "L3"),
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
               ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
               ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sq_sum,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               ROUND(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 6) AS head_sum
        FROM embeddings
        WHERE vec_id < 50
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function surface (SUPER arrays; embeddings):
    size, indexing, slice, transform, filter, aggregate (fold).

    These are the building blocks of the vector ops in llm.similarity —
    all JVM-side codegen, no UDF.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    fold_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_elem"),
        F.round(fold_sum(as_double), 6).alias("vec_sum"),
        F.round(fold_sum(F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))), 6).alias("vec_sq_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(fold_sum(F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))), 6).alias("head_sum"),
    )


@register(
    "datetime_tz_functions",
    tags=("F1",),
    oracle="""
        SELECT event_id,
               timezone('America/New_York', timezone('UTC', ts)) AS ny_local,
               timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo_local,
               EXTRACT(hour FROM timezone('America/New_York', timezone('UTC', ts))) AS ny_hour,
               timezone('America/New_York', timezone('UTC', TIMESTAMP '2024-07-01 12:00:00'))
                   AS ny_summer
        FROM events
        WHERE event_id <= 500
    """,
)
def datetime_tz_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT_TIMEZONE semantics (r01 VERDICT "what's missing" item 5):
    naive UTC event timestamps rendered as America/New_York and
    Asia/Tokyo local time, plus a fixed summer instant so the DST offset
    (EDT -4 vs EST -5) is exercised, not just the static winter offset.

    Both engines resolve named zones via IANA tzdata; the oracle spells
    CONVERT_TIMEZONE('UTC', tgt, ts) as timezone(tgt, timezone('UTC', ts)).
    Scale: row-local expression — no shuffle, whole-stage codegen."""
    from sql_redshift_etl_spark.functions.dialect import convert_timezone

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    ny = convert_timezone("UTC", "America/New_York", F.col("ts"))
    return ev.select(
        "event_id",
        ny.alias("ny_local"),
        convert_timezone("UTC", "Asia/Tokyo", F.col("ts")).alias("tokyo_local"),
        F.hour(ny).cast("long").alias("ny_hour"),
        convert_timezone(
            "UTC", "America/New_York", F.lit("2024-07-01 12:00:00").cast("timestamp")
        ).alias("ny_summer"),
    )


@register(
    "misc_scalar_functions",
    tags=("F1",),
    oracle="""
        SELECT p_partkey,
               GREATEST(p_size, 25) AS size_floor25,
               LEAST(p_size, 25) AS size_cap25,
               GREATEST(p_brand, p_type) AS max_label,
               GREATEST(p_size, NULL, 10) AS null_skipped,
               (p_name ILIKE '%WIDGET%') AS has_widget_ci,
               CAST(ASCII(p_brand) AS BIGINT) AS brand_ascii,
               CHR(CAST(65 + (p_partkey % 26) AS INTEGER)) AS key_letter,
               MD5(p_name) AS name_md5,
               SHA256(p_brand) AS brand_sha256,
               NULLIF(regexp_extract(p_brand, '[0-9]+'), '') AS brand_digits,
               NULLIF(p_type, 'ECONOMY') AS type_or_null
        FROM part
        WHERE p_partkey <= 200
    """,
)
def misc_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining Redshift scalar surface (§2.7): GREATEST/LEAST (both
    engines skip NULLs, Postgres-style), ILIKE, ASCII/CHR, MD5/SHA2
    hashes, REGEXP_SUBSTR, NULLIF.

    REGEXP_SUBSTR returns NULL on no-match in Spark but '' in DuckDB's
    regexp_extract — the oracle normalizes with NULLIF. All built-ins,
    whole-stage codegen; at 100 TB these run at scan speed.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        # .cast("long"): DuckDB's GREATEST/LEAST over INT promotes to
        # BIGINT — int32 vs int64 is representation-only (same str()),
        # but aligning it is free here (r6 dtype burn-down)
        F.greatest(F.col("p_size"), F.lit(25)).cast("long").alias("size_floor25"),
        F.least(F.col("p_size"), F.lit(25)).cast("long").alias("size_cap25"),
        F.greatest(F.col("p_brand"), F.col("p_type")).alias("max_label"),
        F.greatest(F.col("p_size"), F.lit(None).cast("int"), F.lit(10))
        .cast("long")
        .alias("null_skipped"),
        F.col("p_name").ilike("%WIDGET%").alias("has_widget_ci"),
        F.ascii("p_brand").cast("long").alias("brand_ascii"),
        F.char(F.lit(65) + (F.col("p_partkey") % 26)).alias("key_letter"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("p_brand").cast("binary"), 256).alias("brand_sha256"),
        F.regexp_substr("p_brand", F.lit("[0-9]+")).alias("brand_digits"),
        F.nullif(F.col("p_type"), F.lit("ECONOMY")).alias("type_or_null"),
    )
