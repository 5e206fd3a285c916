

def test_type_spelling_rewrites():
    """Redshift type spellings in expressions: DOUBLE PRECISION /
    CHARACTER VARYING anywhere; INT8/NUMERIC/... only after `::` or as
    a CAST tail — a column literally named int8 survives."""
    from sql_redshift_etl_spark.functions.redshift_sql import translate_redshift_sql

    out = translate_redshift_sql(
        "SELECT CAST(x AS DOUBLE PRECISION), CAST(y AS NUMERIC(10,2)), "
        "z::INT8, w::FLOAT4, CAST(v AS INT2), int8 AS int8, "
        "'DOUBLE PRECISION' AS lit FROM t"
    )
    assert "CAST(x AS DOUBLE)" in out
    assert "CAST(y AS DECIMAL(10,2))" in out
    assert "z::BIGINT" in out
    assert "w::FLOAT" in out
    assert "CAST(v AS SMALLINT)" in out
    # bare identifier positions untouched
    assert "int8 AS int8" in out
    # string literals untouched
    assert "'DOUBLE PRECISION'" in out


def test_misc3_scalar_rewrites():
    """Round-6 rewrites: REPLICATE, 1-arg LOG→log10 (base-10 trap),
    STRTOL, DATE_CMP CASE form, QUOTE_IDENT/LITERAL, TO_NUMBER, bare
    VARCHAR casts."""
    from sql_redshift_etl_spark.functions.redshift_sql import translate_redshift_sql as tr

    assert "repeat('ab', 3)" in tr("SELECT REPLICATE('ab', 3)")
    assert "log10(x)" in tr("SELECT LOG(x) FROM t")
    # 2-arg log untouched (same meaning in both extended dialects)
    assert "LOG(2, x)" in tr("SELECT LOG(2, x) FROM t")
    assert "CAST(conv(s, 16, 10) AS BIGINT)" in tr("SELECT STRTOL(s, 16) FROM t")
    out = tr("SELECT DATE_CMP(a, b) FROM t")
    assert "CASE WHEN (a) < (b) THEN -1" in out and "ELSE 0 END" in out
    assert 'concat(\'"\'' in tr("SELECT QUOTE_IDENT(c) FROM t")
    assert "CAST(replace(replace(s, ',', ''), '$', '') AS DECIMAL(8,2))" in tr(
        "SELECT TO_NUMBER(s, '$999,999.99') FROM t"
    )
    assert "CAST(x AS STRING)" in tr("SELECT CAST(x AS VARCHAR) FROM t")
    assert "x::STRING" in tr("SELECT x::VARCHAR FROM t")
    # sized VARCHAR keeps its length
    assert "CAST(x AS VARCHAR(10))" in tr("SELECT CAST(x AS VARCHAR(10)) FROM t")
    # TO_NUMBER rejects non-literal / unsupported formats loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="string literal"):
        tr("SELECT TO_NUMBER(s, fmt_col) FROM t")
    with _pytest.raises(ValueError, match="unsupported format"):
        tr("SELECT TO_NUMBER(s, 'MI9999') FROM t")


def test_partiql_unnest_rewrite():
    """PartiQL `FROM t a, a.col v [AT i]` → LATERAL VIEW; qualifier
    must equal the preceding alias, so schema-qualified comma joins
    pass through."""
    from sql_redshift_etl_spark.functions.redshift_sql import translate_redshift_sql as tr

    out = tr("SELECT e.k, v FROM t e, e.a AS v WHERE v > 5")
    assert "LATERAL VIEW explode(e.a) rs_pq_v AS v" in out and ", e.a" not in out
    out = tr("SELECT e.k, i, v FROM t e, e.a v AT i")
    assert "LATERAL VIEW posexplode(e.a) rs_pq_v AS i, v" in out
    out = tr("SELECT 1 FROM t e, e.a AS v, e.b AS w")
    assert out.count("LATERAL VIEW") == 2
    # comma join of a schema-qualified TABLE is untouched
    out = tr("SELECT * FROM t e, s.other o WHERE e.k = o.k")
    assert "LATERAL VIEW" not in out and "s.other o" in out


def test_listagg_distinct():
    """LISTAGG(DISTINCT x, sep) WITHIN GROUP (ORDER BY x) dedups before
    joining; a foreign order key with DISTINCT raises (Redshift's own
    restriction)."""
    import pytest as _pytest

    from sql_redshift_etl_spark.functions.redshift_sql import translate_redshift_sql as tr

    out = tr("SELECT LISTAGG(DISTINCT v, ',') WITHIN GROUP (ORDER BY v) FROM t")
    assert "collect_set(v)" in out and "array_join" in out
    with _pytest.raises(ValueError, match="same expression"):
        tr("SELECT LISTAGG(DISTINCT v, ',') WITHIN GROUP (ORDER BY o) FROM t")


def test_to_hex_rewrite():
    from sql_redshift_etl_spark.functions.redshift_sql import translate_redshift_sql as tr

    assert "lower(hex(x + 1))" in tr("SELECT TO_HEX(x + 1) FROM t")
