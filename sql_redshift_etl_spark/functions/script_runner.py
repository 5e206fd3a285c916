"""Multi-statement Redshift ETL-script runner.

A sql-redshift-etl project's unit of work is a *script*, not a single
statement: ``BEGIN; CREATE TEMP TABLE stg AS ...; INSERT INTO fct
SELECT ...; DELETE ...; SELECT ...; COMMIT;``. This module executes such
a script end-to-end on Spark: statements are split (quote-aware), each
is rewritten through the single-statement dialect front-end
(functions.redshift_sql.translate_redshift_sql), and the intermediate
"tables" become Spark temp views staged between statements. The last
SELECT's DataFrame is returned.

Statement support:
- ``BEGIN/COMMIT/END/ROLLBACK/VACUUM/ANALYZE/GRANT/REVOKE`` — no-ops
  (transactional/maintenance syntax with no Spark analog).
- ``CREATE SCHEMA name`` / ``DROP SCHEMA name [CASCADE]`` (r6) — Spark
  temp views are single-part names, so declared schemas flatten every
  later ``name.<tbl>`` reference to ``name__<tbl>`` (outside string
  literals; a table alias colliding with a declared schema name would
  shadow — the same hazard Redshift has). DROP SCHEMA of a non-empty
  schema requires CASCADE, which drops its tables.
- ``CREATE [TEMP] TABLE name AS SELECT ...`` — registers the SELECT as
  a temp view (storage clauses like DISTKEY/SORTKEY are stripped by the
  front-end before classification); ``name (a, b) AS SELECT`` renames
  the query's columns positionally (r6).
- ``CREATE [TEMP] TABLE name (col type, ...)`` — empty table with the
  declared schema (Spark parses the DDL column list directly).
- ``CREATE [TEMP] TABLE name (LIKE other)`` — empty table with the
  other table's schema (r5); ``INCLUDING DEFAULTS`` copies the other
  table's DEFAULT attributes, ``EXCLUDING``/bare does not (r6 —
  Redshift's own LIKE contract).
- ``ALTER TABLE a RENAME TO b`` — the atomic-swap publish step (r5):
  the table moves to the new name within script scope.
- ``ALTER TABLE tgt APPEND FROM src`` — Redshift's move-rows publish
  (r5): src's rows append to tgt (positional cast) and src empties;
  IGNOREEXTRA/FILLTARGET accepted (width mismatches already raise).
- ``IDENTITY(seed, step)`` column attribute (r5): recorded and stripped
  from the DDL; INSERTs with a column list that OMITS the identity
  column auto-generate unique ascending values (not consecutive —
  Redshift's own IDENTITY contract). Inherited by CREATE TABLE (LIKE)
  and RENAME, as in Redshift.
- ``CREATE [OR REPLACE] VIEW name AS SELECT ... [WITH NO SCHEMA
  BINDING]`` — same as CTAS (script views are late-bound by nature).
- ``ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE type`` (r6) — cast
  in place (Redshift's varchar-resize/type-migration op).
- ``INSERT INTO name [(cols)] SELECT ... | VALUES ...`` — positional
  append with per-column cast to the target schema; unlisted columns
  of an explicit column list take their declared ``DEFAULT`` literal
  (r6; recorded from CREATE/ALTER DDL, inherited by CREATE (LIKE ...
  INCLUDING DEFAULTS), following renames, dying with drops), else NULL.
- ``DELETE FROM name [WHERE cond]`` — keeps rows where ``cond`` is not
  TRUE (NULL-cond rows survive, matching SQL DELETE); subqueries in
  ``cond`` work because the filter runs through ``spark.sql``.
- ``DELETE FROM name USING src [, ...] WHERE cond`` — join-based delete
  (r5): rows matching ANY source row go (NOT EXISTS → left-anti join);
  WHERE is required.
- ``UPDATE name SET c = e, ... [WHERE cond]`` — CASE-projection per
  assigned column, cast back to the column's declared type.
- ``UPDATE name SET ... FROM src [, ...] WHERE cond`` — join-based
  update (r5): each target row updates AT MOST once even on multi-match
  joins (deterministic pick); WHERE is required (loud).
- ``TRUNCATE [TABLE] name`` / ``DROP TABLE|VIEW [IF EXISTS] name``.
- ``COPY name FROM 'path' [FORMAT AS CSV|JSON|PARQUET] [IGNOREHEADER n]
  [DELIMITER 'c'] [IAM_ROLE ...]`` — bulk load appended to an existing
  table (the Redshift contract: COPY targets a created table, whose
  declared schema becomes the read schema — never inferSchema). Bare
  COPY (no format) is Redshift's pipe-delimited text. Auth clauses are
  accepted and ignored (credentials belong to the filesystem conf);
  unknown options raise.
- ``UNLOAD ('select...') TO 'path' [FORMAT AS PARQUET|CSV] [PARTITION
  BY (...)] [HEADER] [ALLOWOVERWRITE] [PARALLEL OFF] [MANIFEST]`` — the
  inner query (quote-unescaped, dialect-rewritten) written to files;
  PARALLEL OFF coalesces to one file, ALLOWOVERWRITE maps to
  mode=overwrite (without it an existing prefix errors, as in
  Redshift), MANIFEST writes a Redshift-format file manifest after the
  data (sources.writers.write_manifest); GZIP/BZIP2/ZSTD map to the
  writer codec (parquet: gzip/zstd; text: gzip/bzip2 — loud otherwise),
  NULL AS 'str' writes/reads the null sentinel, and MAXFILESIZE n
  [MB|GB] (r6) sizes output files by repartitioning to the estimated
  byte total / cap (sampled row size; approximate, as in Redshift).
- ``COPY ... MAXERROR n`` (r6) — the error-budgeted load: malformed
  CSV/TEXT/JSON rows are counted (corrupt-record column), the load
  fails loudly past the budget and skips the bad rows within it;
  skipped raw records accumulate in a script-scoped
  ``stl_load_errors`` table (tbl, raw_line — the system-table analog);
  MAXERROR on PARQUET/FIXEDWIDTH raises.
- ``INSERT INTO name DEFAULT VALUES`` (r6) — one row of declared
  defaults (identity generates; unattributed columns NULL).
- ``COPY ... DATEFORMAT/TIMEFORMAT 'fmt'`` (r6) — Redshift-dialect
  read formats for delimited text, translated to Spark patterns
  ('auto' = engine default); epoch spellings and non-text formats
  raise.
- ``COPY ... [FORMAT AS] JSON 'spec'`` (r13) — 'auto' /
  'auto ignorecase' = name-matched load; any other spec is a jsonpaths
  control file reshaping nested documents into flat columns
  positionally (readers.read_json_with_paths; dot and bracket path
  spellings; count mismatch and unspellable bracket keys raise).
  Malformed records follow the COPY contract: without MAXERROR the
  load fails at the first bad line (per-column validity guard, never a
  silent row of NULLs); with MAXERROR they consume the budget and land
  in stl_load_errors.
- ``COPY`` data-conversion parameters (r6): BLANKSASNULL, TRIMBLANKS,
  EMPTYASNULL, IGNOREBLANKLINES, ACCEPTINVCHARS ['c'] (decoder
  replacement chars U+FFFD → the requested char, default '?') applied
  to parsed string columns / all-null rows (text loads only — PARQUET
  raises); ACCEPTANYDATE, ESCAPE, TRUNCATECOLUMNS,
  COMPUPDATE/STATUPDATE, ENCRYPTED accepted as no-ops (PERMISSIVE
  parsing already nulls unparseable dates, Spark's CSV reader already
  honors backslash escapes, strings are unbounded, maintenance/storage
  flags have no Spark analog).
- ``COPY name FROM 'path' FIXEDWIDTH 'label:width,...'`` (r6) — fixed
  -width text load: lines cut by the spec (which must cover exactly
  the target's columns), fields right-trimmed, NULL AS honored, cast
  to the declared schema. FIXEDWIDTH with FORMAT raises.
- ``COPY name FROM 'path/manifest' ... MANIFEST`` — the path is a
  manifest file; exactly its listed files load (a missing mandatory
  file raises before any read). ``EXPLICIT_IDS`` is accepted (our COPY
  loads provided values positionally, which is exactly its meaning).
- ``CREATE EXTERNAL TABLE name (cols) [PARTITIONED BY (...)] [ROW
  FORMAT DELIMITED FIELDS TERMINATED BY 'c'] STORED AS PARQUET|TEXTFILE
  LOCATION 'path'`` — the Spectrum analog (r5): a schema-on-read
  binding over the prefix; PARQUET validates declared columns against
  the files and discovers hive partitions; TEXTFILE reads the declared
  schema at the given delimiter.
- ``MERGE INTO tgt USING src ON cond WHEN MATCHED THEN UPDATE SET ...|
  DELETE WHEN NOT MATCHED THEN INSERT ...`` and the simplified
  ``ON cond REMOVE DUPLICATES`` form (r6) — executed through the
  relational merge plan (operators/merge.py); a source key matching
  multiple target rows raises at runtime, as in Redshift.
- ``CREATE MATERIALIZED VIEW name [BACKUP ...] [AUTO REFRESH ...] AS
  SELECT ...`` / ``REFRESH MATERIALIZED VIEW name`` (r6) — CREATE
  snapshots the defining query (eager analysis = Redshift's
  stale-until-REFRESH contract); REFRESH re-runs the stored definition.
- ``SELECT ... INTO [TEMP] name FROM ...`` (r6) — the one-line CTAS.
- ``CREATE [OR REPLACE] PROCEDURE name(params) AS $$ [DECLARE ...]
  BEGIN ... END $$ LANGUAGE plpgsql`` / ``CALL name(args)`` /
  ``DROP PROCEDURE`` (r6) — the body executes in place at CALL with IN
  parameters substituted on identifier boundaries (plpgsql's own
  lexical substitution), and supports the procedural core: IF/ELSIF/
  ELSE, WHILE ... LOOP, FOR i IN [REVERSE] a..b [BY step] LOOP (r7:
  BY; non-positive steps loud, plpgsql's rule), CASE statements (r7:
  searched + simple value-list forms, case_not_found raise), FOR rec IN
  <query> LOOP (bounded control-table iteration), bare LOOP, EXIT/
  CONTINUE [WHEN], bare RETURN, RAISE, and DECLAREd scalar variables
  with ``var := expr`` and ``SELECT ... INTO [STRICT] var`` (values
  substitute as typed literals at each use site; STRICT — r12 —
  demands exactly one row, raising catchable no_data_found P0002 /
  too_many_rows P0003 via a bounded take(2), and always leaves FOUND
  true on success, plpgsql's rule). Round 9 adds nested
  ``DECLARE ... BEGIN ... END`` sub-blocks: the inner scalars shadow
  same-name outer variables for the block's extent and un-shadow on any
  exit path (normal, EXIT/CONTINUE, RETURN, or a caught error); defaults
  re-evaluate at each entry. Round 7 adds the remaining
  procedural core:
  * ``BEGIN ... EXCEPTION WHEN OTHERS THEN handler END`` blocks (the
    nightly-load error-wrapper idiom) — on entry the script state
    snapshots and every table mutation inside materializes eagerly
    (localCheckpoint) so an execution error surfaces AT the statement
    that caused it, not at some later action; a caught error restores
    the snapshot ("changes are rolled back", plpgsql's contract) and
    runs the handler, where SQLERRM/SQLSTATE substitute the message
    and a classified code. Only WHEN OTHERS is accepted — Redshift's
    own restriction. The runner's unsupported-construct ValueErrors
    stay loud rather than routing to handlers: a real engine would
    have executed those statements, so "catching" them would silently
    change semantics. Cost model: each guarded mutation runs a real
    job at bind time — guard hot loops, not bulk loads you could
    guard one level up.
  * ``EXECUTE <string expr> [INTO var, ...] [USING expr, ...]``
    dynamic SQL — the expression evaluates with current variable
    values (QUOTE_IDENT/QUOTE_LITERAL do the quoting) and the text
    runs as one statement; dynamic SQL does not see plpgsql variables
    (plpgsql's contract). USING (r8) binds each argument's VALUE to
    its $N placeholder as a typed literal — value-not-text, outside
    quotes only, one bounded one-row job per argument.
  * forward-only cursors: ``name CURSOR FOR <query>`` in DECLARE,
    ``OPEN`` (evaluates the query, buffering at most 1000 control
    rows driver-side — the bounded coordinator-loop contract shared
    with FOR-over-query), ``FETCH [NEXT] [FROM] cur INTO vars`` (sets
    ``found``; NULLs past the end), ``CLOSE``. SCROLL/parameterized
    cursors and FETCH counts are loud.
  * ``GET DIAGNOSTICS var := ROW_COUNT`` — rows affected by the last
    tracked statement (INSERT/UPDATE/DELETE/TRUNCATE via lazy
    affected-set plans counted only when read; SELECT INTO var, FETCH
    and EXECUTE INTO report 0/1). Untracked statements reset the
    count, and reading it then is loud — never silently stale.
  * ``PERFORM query`` (r8) — run-and-discard: sets ``found`` from a
    bounded limit-1 probe; the discarded row count feeds ROW_COUNT as
    the usual lazy plan.
  * ``FOUND`` (r12) — the full plpgsql setter list: SELECT INTO,
    PERFORM, INSERT/UPDATE/DELETE (lazily, like ROW_COUNT — a body
    that never reads FOUND after a DML pays zero extra jobs), FETCH,
    and query-FOR loop exit — on ANY exit path, EXIT included
    (r13, ADVICE r12: exec_for_query stamps "iterated at least once"
    after the loop regardless of how it ended). EXECUTE never sets it
    (plpgsql's own rule: EXECUTE feeds GET DIAGNOSTICS, not FOUND);
    TRUNCATE/MERGE are not in plpgsql's setter list and leave it
    alone. Auto-declared (FALSE, per call) when the body mentions
    ``found``/``PERFORM`` or declares a cursor — and a body that ALSO
    declares or aliases a COLUMN literally named ``found`` raises the
    plpgsql variable_conflict ambiguity error instead of silently
    substituting (r13, ADVICE r12).
  * INOUT parameters (r8) — scoped variables initialized from the
    CALL argument; the CALL returns their final values as a one-row
    result (Redshift's contract). OUT stays loud because Redshift
    itself forbids OUT arguments in a SQL-level CALL.
  Still loud: OUT params, RETURN with a value, GET DIAGNOSTICS of
  anything but ROW_COUNT.
  Cost model note (r6): WHILE/FOR loop conditions evaluate as one
  1-row Spark job per iteration (capped at 1000) — faithful to
  coordinator-side plpgsql, so a 1000-iteration loop costs the job
  floor x 1000 at ANY data size; loop over control rows, never facts.
- ``CREATE [OR REPLACE] FUNCTION f(a type, ...) RETURNS type AS
  $$ SELECT expr $$ LANGUAGE sql`` / ``DROP FUNCTION`` (r6) — scalar
  SQL UDFs inlined textually at every call site ($N positional or
  named params; UDFs may call UDFs, depth-capped), so Catalyst sees
  plain expressions — zero UDF overhead, exactly how Redshift inlines
  them. ``LANGUAGE plpythonu`` (r9) compiles the Python body once at
  CREATE and registers it as an Arrow-batched pandas UDF (NULL ↔ None,
  Redshift's contract); DROP tombstones it loudly.
- ``SET knob = value`` (r6) — warehouse session knobs are accepted
  no-ops; ``SET search_path`` resolves unqualified names against the
  declared schemas in path order (read-side; a plain binding shadows
  the path; undeclared schemas raise).
- ``BEGIN / COMMIT / END / ROLLBACK / ABORT`` (r6) — real single-level
  transactions: BEGIN snapshots the script state (shallow copies of
  immutable bindings), ROLLBACK restores it; nested BEGIN is ignored
  (Redshift warns-and-ignores); file side effects (UNLOAD output) are
  not unwritten, matching Redshift's S3 contract.
- ``EXPLAIN ... / SHOW ...`` (r6) — passed to Spark; output is
  engine-specific by nature.
- ``SELECT ... / WITH ...`` — executed; the LAST one is the script's
  result DataFrame.

Execution model (Spark-first, deliberately): staged tables stay *lazy*
views, so the whole script up to the final SELECT is ONE Catalyst plan —
filters in the final query push down through every staging "table", and
nothing materializes that the result does not need (the argument of
operators/pipelines.py, applied to verbatim scripts). ``spark.sql``
analyzes eagerly, so each statement binds to the table definitions as
they stood when it ran: a self-referencing ``INSERT INTO t SELECT ...
FROM t`` appends a snapshot, later ``DROP``s cannot retroactively break
earlier derivations, and the cleanup of script-scoped temp views after
the run cannot invalidate the returned DataFrame. At 100 TB a staging
table reused by MANY downstream statements can be worth materializing
once instead of recomputing per consumer — that is an explicit
``sources.writers.unload_parquet`` checkpoint in this engine, not an
implicit runner behavior.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sql_redshift_etl_spark.functions.redshift_sql import (
    rewrite_temp_names,
    strip_sql_comments,
    translate_redshift_sql,
)

__all__ = ["run_redshift_script", "split_statements", "strip_comments"]


# Shared with the single-statement front-end (one implementation of
# quote-aware comment stripping; redshift_sql also strips internally).
strip_comments = strip_sql_comments


def split_statements(script: str) -> list[str]:
    """Split a script on ``;`` outside string literals and outside
    ``$$``-dollar-quoted bodies (CREATE PROCEDURE ... AS $$ ... $$)."""
    stmts: list[str] = []
    buf: list[str] = []
    in_quote = False
    in_dollar = False
    s = strip_comments(script)
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if not in_quote and ch == "$" and s.startswith("$$", i):
            in_dollar = not in_dollar
            buf.append("$$")
            i += 2
            continue
        if ch == "'" and not in_dollar:
            in_quote = not in_quote
            buf.append(ch)
        elif ch == ";" and not in_quote and not in_dollar:
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


_NOOP = re.compile(
    r"^(BEGIN|COMMIT|END|ROLLBACK|ABORT|VACUUM|ANALYZE|GRANT|REVOKE|COMMENT|LOCK)\b",
    re.IGNORECASE,
)
_CTAS = re.compile(
    r"^CREATE\s+(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
# CTAS with a column list (`CREATE TABLE t (a, b) AS SELECT ...`):
# bare identifiers only — anything typed is DDL. Checked before
# _CREATE_DDL, whose greedy paren body would swallow the AS query.
_CTAS_COLS = re.compile(
    r"^CREATE\s+(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
    r"\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_DDL = re.compile(
    r"^CREATE\s+(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_VIEW = re.compile(
    # WITH NO SCHEMA BINDING (Redshift late-binding views) is accepted:
    # script-scoped views are late-bound by nature (temp-view rebinds)
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.+?)"
    r"(?:\s+WITH\s+NO\s+SCHEMA\s+BINDING)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    # query may be parenthesized (`INSERT INTO t (SELECT ...)`, a common
    # Redshift spelling — Spark parses the parenthesized query natively)
    r"^INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?"
    r"((?:SELECT|WITH|VALUES)\b.*|\(\s*(?:SELECT|WITH)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
# Redshift SQL UDFs: `CREATE [OR REPLACE] FUNCTION f(a type, ...)
# RETURNS type [STABLE|IMMUTABLE|VOLATILE] AS $$ SELECT expr $$
# LANGUAGE sql` — the body is a scalar expression over the parameters
# ($1/$2 positional or named), inlined textually at every call site
# (Redshift itself inlines scalar SQL UDFs into the plan; here that
# means Catalyst sees plain expressions — zero UDF overhead).
# plpythonu bodies register as Arrow-batched pandas UDFs (see
# _register_python_udf below).
_CREATE_FUNC_HEAD = re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+([\w.]+)\s*\(", re.IGNORECASE
)
# Redshift Lambda UDFs (CREATE EXTERNAL FUNCTION ... LAMBDA '...') call
# an AWS Lambda endpoint per batch — an environment exclusion here (no
# network, no AWS), seamed loudly like the JDBC-to-real-Redshift path.
_CREATE_EXT_FUNC = re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?EXTERNAL\s+FUNCTION\b", re.IGNORECASE
)
_CREATE_FUNC_TAIL = re.compile(
    r"^\s*RETURNS\s+(\w+)(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?\s*"
    r"(?:STABLE|IMMUTABLE|VOLATILE)?\s*AS\s+\$\$(.*)\$\$\s*"
    r"LANGUAGE\s+(\w+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_FUNC = re.compile(
    r"^DROP\s+FUNCTION\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*(?:\([^)]*\))?\s*$",
    re.IGNORECASE,
)


def _parse_func_params(params: str) -> list[str]:
    """Parameter NAMES from a SQL-UDF signature; unnamed (type-only)
    parameters are referenced as $N and get positional placeholders."""
    names: list[str] = []
    for i, p in enumerate(_split_top_commas(params)):
        p = p.strip()
        if not p:
            continue
        pm = re.match(r"(?i)^([\w$]+)\s+\w", p)
        # a bare type (e.g. "float, float") means positional-only refs
        names.append(pm.group(1) if pm else f"${i + 1}")
    return names


def _inline_sql_udfs(sql: str, funcs: dict[str, tuple[list[str], str]]) -> str:
    """Inline every call to a script-defined SQL UDF: balanced-scan the
    argument list, substitute named params on identifier boundaries and
    $N positionally, wrap in parens. Repeats until no calls remain, so
    UDFs may call other UDFs (depth-capped loudly)."""
    for _ in range(16):
        changed = False
        for fname, (params, expr) in funcs.items():
            pat = re.compile(rf"(?<![\w$]){re.escape(fname)}\s*\(", re.IGNORECASE)
            while True:
                hits = [m for m in pat.finditer(sql) if not _in_lit(sql, m.start())]
                if not hits:
                    break
                m = hits[-1]
                end = _scan_balanced_fwd(sql, m.end())
                args = [a.strip() for a in _split_top_commas(sql[m.end() : end - 1]) if a.strip()]
                if len(args) != len(params):
                    raise ValueError(
                        f"{fname}(): expected {len(params)} argument(s), got {len(args)}"
                    )
                body = expr
                for i, (p, a) in enumerate(zip(params, args)):
                    body = re.sub(rf"\${i + 1}\b", f"({a})", body)
                    if not p.startswith("$"):
                        body = re.sub(
                            rf"(?i)(?<![\w$]){re.escape(p)}(?![\w$])", f"({a})", body
                        )
                sql = f"{sql[: m.start()]}({body}){sql[end:]}"
                changed = True
        if not changed:
            return sql
    raise ValueError("SQL UDF inlining exceeded depth 16 (recursive definition?)")


def _in_lit(sql: str, pos: int) -> bool:
    return sql.count("'", 0, pos) % 2 == 1


# Redshift scalar Python UDFs: `CREATE FUNCTION f(a type, ...) RETURNS
# type AS $$ <python body> $$ LANGUAGE plpythonu` (r9). The body is a
# Python FUNCTION BODY over the named parameters (Redshift's contract:
# NULL arrives as None, returning None yields NULL). Spark-first
# execution: the body compiles ONCE at CREATE time into a plain Python
# function, registered as an Arrow-batched pandas UDF that applies it
# per element — the per-row Python step is inherent to an arbitrary
# Python body (Redshift itself runs plpythonu row-at-a-time in its
# sandbox); what Spark buys is the Arrow columnar transfer instead of
# per-row IPC, the same reason functions/udfs.py bans row-at-a-time
# @udf but allows pandas UDFs.
_PY_UDF_TYPES: dict[str, str] = {
    "smallint": "bigint", "int2": "bigint", "integer": "bigint",
    "int": "bigint", "int4": "bigint", "bigint": "bigint", "int8": "bigint",
    "real": "double", "float4": "double", "float": "double",
    "float8": "double", "double": "double",
    # Redshift converts decimal args to float for plpythonu anyway
    "decimal": "double", "numeric": "double",
    "varchar": "string", "char": "string", "bpchar": "string",
    "nvarchar": "string", "text": "string", "character": "string",
    "boolean": "boolean", "bool": "boolean",
    "date": "date", "timestamp": "timestamp",
    # Redshift's TIMESTAMPTZ: instant semantics — Spark's TIMESTAMP
    # (TIMESTAMP_LTZ) is the matching instant type; the body sees a
    # tz-naive datetime in session time, like Redshift's UTC-normalized
    # sandbox value
    "timestamptz": "timestamp",
}


def _py_udf_spark_type(rtype: str, fname: str) -> str:
    t = _PY_UDF_TYPES.get(rtype.lower())
    if t is None:
        raise ValueError(
            f"CREATE FUNCTION {fname}: plpythonu RETURNS {rtype} is outside "
            f"the supported subset ({', '.join(sorted(set(_PY_UDF_TYPES)))})"
        )
    return t


def _compile_py_udf(fname: str, params: list[str], body: str):
    """Compile the $$ body $$ into a scalar Python function of the named
    parameters. Loud on syntax errors at CREATE time (Redshift validates
    at CREATE too)."""
    import textwrap

    inner = textwrap.dedent(body).strip("\n") or "pass"
    src = f"def _rs_py_udf({', '.join(params)}):\n" + textwrap.indent(inner, "    ")
    ns: dict = {}
    try:
        exec(compile(src, f"<plpythonu:{fname}>", "exec"), ns)
    except SyntaxError as ex:
        raise ValueError(
            f"CREATE FUNCTION {fname}: plpythonu body does not compile: {ex}"
        ) from None
    return ns["_rs_py_udf"]


def _parse_func_param_types(params: str) -> list[str]:
    """Parameter TYPE names from a function signature ('bal FLOAT8, seg
    VARCHAR(10)' -> ['FLOAT8', 'VARCHAR']); a bare type (unnamed param)
    passes through as itself."""
    types: list[str] = []
    for p in _split_top_commas(params):
        p = p.strip()
        if not p:
            continue
        pm = re.match(r"(?i)^[\w$]+\s+(\w+)", p)
        types.append(pm.group(1) if pm else p.split("(")[0].strip())
    return types


# declared-type argument casters: Spark does not coerce a UDF's inputs
# to any declared type (the call site passes the column's own Python
# value — decimal.Decimal for DECIMAL, int for BIGINT), but Redshift's
# plpythonu contract does: decimal arguments convert to float (the
# _PY_UDF_TYPES mapping above), and a body declared FLOAT8 must see
# float. Applied per non-None value, after the Arrow conversion.
_PY_ARG_COERCE = {"bigint": int, "double": float, "boolean": bool}


def _register_python_udf(
    spark: SparkSession,
    fname: str,
    params: list[str],
    ptypes: list[str],
    rtype: str,
    body: str,
) -> None:
    from pyspark.sql.functions import udf

    fn = _compile_py_udf(fname, params, body)
    # validates every declared type at CREATE time, like RETURNS
    coercers = [_PY_ARG_COERCE.get(_py_udf_spark_type(t, fname)) for t in ptypes]

    # Arrow-OPTIMIZED udf (useArrow=True → ArrowEvalPython, never the
    # banned pickling BatchEvalPython): the Arrow validity bitmap
    # reaches Python intact, so the body sees exactly Redshift's sandbox
    # contract — SQL NULL is None while a genuine FLOAT8 NaN stays
    # float('nan') (a pandas_udf float64 batch conflates the two — r9
    # ADVICE), and DATE/TIMESTAMP arrive as datetime.date/datetime.
    # The declared-type casters then apply (r10 review: a DECIMAL column
    # bound to a FLOAT8 parameter must reach the body as float, not
    # decimal.Decimal — Redshift converts; float('nan') survives
    # float() unchanged, so the NaN≠NULL fix is unaffected).
    if any(coercers):
        inner = fn

        def fn(*args):  # noqa: F811 — deliberate wrap of the compiled body
            return inner(
                *(
                    a if a is None or co is None else co(a)
                    for a, co in zip(args, coercers)
                )
            )

    fn.__name__ = f"rs_py_{fname}"
    spark.udf.register(fname, udf(fn, _py_udf_spark_type(rtype, fname), useArrow=True))


def _register_py_udf_tombstone(spark: SparkSession, fname: str) -> None:
    """Spark has no udf-unregister, so DROP FUNCTION (and end-of-script
    descoping) re-registers a stub that raises on evaluation — a call
    after DROP is loud, never a stale-result footgun."""
    from pyspark.sql.functions import udf

    def _gone(*cols):
        raise ValueError(
            f"function {fname} does not exist (dropped or script-scoped)"
        )

    _gone.__name__ = f"rs_py_dropped_{fname}"
    spark.udf.register(fname, udf(_gone, "string", useArrow=True))


# Script-scoped schemas: Spark temp views are single-part names, so
# `CREATE SCHEMA staging` records the name and every later
# `staging.<tbl>` reference flattens to `staging__<tbl>` (applied
# outside string literals, only for schemas the script DECLARED — a
# bare alias.column reference never matches unless the alias collides
# with a declared schema name, the same shadowing hazard Redshift has).
_CREATE_SCHEMA = re.compile(
    r"^CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:AUTHORIZATION\s+\w+)?\s*(?:QUOTA\s+[\w.]+(?:\s+\w+)?)?\s*$",
    re.IGNORECASE,
)
_DROP_SCHEMA = re.compile(
    r"^DROP\s+SCHEMA\s+(?:IF\s+EXISTS\s+)?(\w+)\s*(CASCADE|RESTRICT)?\s*$",
    re.IGNORECASE,
)
_INSERT_DEFAULTS = re.compile(
    r"^INSERT\s+INTO\s+([\w.]+)\s+DEFAULT\s+VALUES\s*$", re.IGNORECASE
)
_DELETE = re.compile(
    r"^DELETE\s+FROM\s+([\w.]+)(?:\s+(.+))?$", re.IGNORECASE | re.DOTALL
)
_UPDATE = re.compile(r"^UPDATE\s+([\w.]+)\s+SET\s+(.+)$", re.IGNORECASE | re.DOTALL)


def _split_set_where(body: str) -> tuple[str, str | None]:
    """Split an UPDATE's SET body from its optional WHERE at the TOP
    level only (paren- and quote-aware): a WHERE inside a subquery
    assignment like ``SET v = (SELECT max(x) FROM s WHERE k = 1)`` or
    inside a string literal is content, not the clause keyword."""
    depth, in_quote = 0, False
    n = len(body)
    for i, ch in enumerate(body):
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and body[i : i + 5].upper() == "WHERE"
                and i > 0
                and body[i - 1].isspace()
                and (i + 5 == n or not (body[i + 5].isalnum() or body[i + 5] == "_"))
            ):
                return body[:i].strip(), body[i + 5 :].strip()
    return body.strip(), None


def _split_top_kw(body: str, kw: str) -> tuple[str, str | None]:
    """Split ``body`` at the first TOP-LEVEL occurrence of keyword ``kw``
    (paren- and quote-aware) — same contract as _split_set_where, for the
    UPDATE ... FROM clause (a FROM inside a subquery assignment or a
    SUBSTRING(x FROM 2) sits at depth > 0 and is content)."""
    depth, in_quote = 0, False
    n, k = len(body), len(kw)
    for i, ch in enumerate(body):
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and body[i : i + k].upper() == kw
                and i > 0
                and body[i - 1].isspace()
                and (i + k == n or not (body[i + k].isalnum() or body[i + k] == "_"))
            ):
                return body[:i].strip(), body[i + k :].strip()
    return body.strip(), None
_CREATE_LIKE = re.compile(
    r"^CREATE\s+(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(\s*LIKE\s+([\w.]+)\s*(INCLUDING|EXCLUDING)?\s*(?:DEFAULTS)?\s*\)\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*$", re.IGNORECASE
)
_ALTER_APPEND = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+APPEND\s+FROM\s+([\w.]+)"
    r"(?:\s+(?:IGNOREEXTRA|FILLTARGET))?\s*$",
    re.IGNORECASE,
)
# Column DDL (Redshift ALTER TABLE subset a real ETL script uses):
# ADD [COLUMN] name type [DEFAULT literal], DROP [COLUMN] name,
# RENAME COLUMN a TO b. Existing rows take the DEFAULT (or NULL) —
# Redshift's own backfill semantics for an added column.
_ALTER_COL_TYPE = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+(?:COLUMN\s+)?(\w+)\s+"
    r"(?:SET\s+DATA\s+)?TYPE\s+([\w]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*$",
    re.IGNORECASE,
)
_ALTER_ADD_COL = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+"
    r"([\w]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
    r"(?:\s+DEFAULT\s+('[^']*'|[-\w.]+))?\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_COL = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*$", re.IGNORECASE
)
_ALTER_RENAME_COL = re.compile(
    r"^ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$",
    re.IGNORECASE,
)
# Redshift type spellings Spark's DDL parser does not know. Applied to
# CREATE TABLE column lists only (never to data or expressions).
_TYPE_SPELLINGS = [
    (re.compile(r"\bDOUBLE\s+PRECISION\b", re.IGNORECASE), "DOUBLE"),
    (re.compile(r"\bCHARACTER\s+VARYING\b", re.IGNORECASE), "VARCHAR"),
    (re.compile(r"\bBPCHAR\b", re.IGNORECASE), "CHAR"),
    (re.compile(r"\bNUMERIC\b", re.IGNORECASE), "DECIMAL"),
    (re.compile(r"\bINT8\b", re.IGNORECASE), "BIGINT"),
    (re.compile(r"\bINT4\b", re.IGNORECASE), "INT"),
    (re.compile(r"\bINT2\b", re.IGNORECASE), "SMALLINT"),
    (re.compile(r"\bFLOAT8\b", re.IGNORECASE), "DOUBLE"),
    (re.compile(r"\bFLOAT4\b", re.IGNORECASE), "FLOAT"),
]


def _normalize_ddl_types(body: str) -> str:
    for pat, repl in _TYPE_SPELLINGS:
        body = pat.sub(repl, body)
    return body


# IDENTITY(seed, step) column attribute inside a CREATE TABLE column
# list: values are engine-generated. Captured (and stripped) before
# StructType.fromDDL, which cannot parse it.
_IDENTITY_ATTR = re.compile(
    r"(\w+)\s+(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s+IDENTITY\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)",
    re.IGNORECASE,
)
# DEFAULT <literal> column attribute: recorded (INSERTs omitting the
# column fill the default — Redshift's contract) and stripped before
# StructType.fromDDL. Literal forms plus the audit-column clock
# functions (DEFAULT GETDATE()/SYSDATE arrive here as
# current_timestamp() — the front-end rewrites them first); a fill
# from a clock default pins the bound table (localCheckpoint), since a
# nondeterministic expression must not re-evaluate per downstream
# action. Other expression defaults stay out of scope.
_DEFAULT_ATTR = re.compile(
    r"(\w+)\s+(\w+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?(?:\s+NOT\s+NULL)?)\s+"
    r"DEFAULT\s+('(?:[^']|'')*'|[-+]?\d+(?:\.\d+)?|TRUE|FALSE|NULL"
    r"|current_timestamp\s*\(\s*\)|current_date\b)",
    re.IGNORECASE,
)
_VOLATILE_DEFAULT = re.compile(r"(?i)current_timestamp|current_date")
# Redshift Spectrum analog (r5): an external table is a schema-on-read
# binding over a storage prefix — exactly a Spark read. Bounded subset:
# PARQUET (self-describing; optional hive PARTITIONED BY discovered from
# the directory layout) and TEXTFILE with a declared schema + delimiter.
_CREATE_EXTERNAL_HEAD = re.compile(
    r"^CREATE\s+EXTERNAL\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(",
    re.IGNORECASE,
)
_CREATE_EXTERNAL_TAIL = re.compile(
    r"^\s*(?:PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))*)\)\s*)?"
    r"(?:ROW\s+FORMAT\s+DELIMITED\s+FIELDS\s+TERMINATED\s+BY\s+'([^']*)'\s*)?"
    r"STORED\s+AS\s+(PARQUET|TEXTFILE)\s+"
    r"LOCATION\s+'([^']+)'\s*(?:TABLE\s+PROPERTIES\s*\([^)]*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _scan_balanced_fwd(text: str, i: int) -> int:
    """Index just past the paren that closes the one opened before ``i``
    (quote-aware) — the column list of CREATE EXTERNAL TABLE contains
    nested parens (VARCHAR(8), DECIMAL(18,2)) a non-greedy regex chops."""
    depth, in_quote = 1, False
    while depth:
        ch = text[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        i += 1
    return i
# Redshift MERGE (the last SQL-DML spelling): MERGE INTO tgt [AS a]
# USING src [AS b] ON cond WHEN MATCHED THEN {UPDATE SET ...|DELETE}
# WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (...). Spark's own MERGE
# INTO parser needs a v2 table (Delta/Iceberg — absent), so the
# statement executes through the proven relational plan in
# operators/merge.py (full-outer join + conditional projection). The
# negative lookahead keeps a bare `MERGE INTO t USING ...` from parsing
# "USING" as the target alias.
_MERGE = re.compile(
    r"^MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?\s+USING\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
# Redshift stored procedures (plpgsql): the $$ body is [DECLARE ...]
# BEGIN ... END with plain SQL plus the procedural core (IF/WHILE/FOR/
# LOOP/EXIT/CONTINUE/RETURN/RAISE/variables — see the control-flow
# section below); cursors/EXECUTE/EXCEPTION blocks raise loudly. IN
# params substitute textually at CALL time on identifier boundaries.
# Matched on the RAW statement (before the dialect front-end) so the
# body reaches CALL-time untouched.
_CREATE_PROC_HEAD = re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?PROCEDURE\s+([\w.]+)\s*\(", re.IGNORECASE
)
_CREATE_PROC_TAIL = re.compile(
    r"^\s*AS\s+\$\$(.*)\$\$\s*LANGUAGE\s+plpgsql\s*$", re.IGNORECASE | re.DOTALL
)
_CALL = re.compile(r"^CALL\s+([\w.]+)\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL)
_DROP_PROC = re.compile(
    r"^DROP\s+PROCEDURE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*(?:\([^)]*\))?\s*$",
    re.IGNORECASE,
)
# plpgsql procedural surface: r6 added IF/ELSIF/ELSE, WHILE ... LOOP,
# FOR i IN a..b LOOP and RAISE; r7 added EXCEPTION WHEN OTHERS blocks,
# EXECUTE dynamic SQL, and forward-only cursors; r8 added PERFORM and
# EXECUTE ... USING — the create-time reject gate is gone because
# nothing procedural is rejected at CREATE anymore (remaining
# out-of-subset spellings raise at their own execution sites).


def _parse_proc_params(params: str) -> list[tuple[str, str, str]]:
    """(name, mode, type) triples from a procedure signature. IN params
    substitute textually at CALL time (plpgsql's lexical model); INOUT
    params (r8) become scoped variables initialized from the CALL
    argument, and the CALL returns their final values as a one-row
    result — Redshift's contract. OUT stays loud because Redshift
    itself forbids OUT arguments in a SQL-level CALL."""
    out: list[tuple[str, str, str]] = []
    for p in _split_top_commas(params):
        p = p.strip()
        if not p:
            continue
        if re.match(r"(?i)^OUT\b", p):
            raise ValueError(
                f"CREATE PROCEDURE: OUT parameters cannot be passed in a "
                f"SQL-level CALL (Redshift's own restriction) — use INOUT ({p!r})"
            )
        if "=" in p or re.search(r"(?i)\bDEFAULT\b", p):
            raise ValueError(f"CREATE PROCEDURE: parameter defaults unsupported ({p!r})")
        pm = re.match(r"(?i)^(IN\s+|INOUT\s+)?([\w$]+)\s+(\w.*)$", p)
        if pm is None:
            raise ValueError(f"CREATE PROCEDURE: cannot parse parameter {p!r}")
        mode = (pm.group(1) or "IN").strip().upper()
        out.append((pm.group(2), mode, pm.group(3).strip()))
    return out


# ---------------------------------------------------------------------------
# plpgsql control flow (round 6): IF/ELSIF/ELSE, WHILE ... LOOP,
# FOR i IN [REVERSE] a..b LOOP, and RAISE inside procedure bodies.
#
# Design: block bodies are kept as RAW TEXT and re-parsed lazily when the
# block executes (a WHILE body re-parses per iteration), so the script
# runner's worklist model is unchanged — control nodes sit in the same
# deque as plain statements and expand in place when popped. Conditions
# are arbitrary boolean SQL expressions (scalar subqueries included),
# evaluated through the same dialect front-end as every other statement
# via a one-row ``SELECT CAST((cond) AS BOOLEAN)``.
#
# All of plpgsql's procedural statements are now handled at their own
# execution sites (r6-r8); out-of-subset SPELLINGS of each construct
# raise there, not at CREATE.


class _IfNode:
    __slots__ = ("branches", "else_body")

    def __init__(self, branches: list[tuple[str, str]], else_body: str | None):
        self.branches = branches  # [(cond_sql, body_text), ...]
        self.else_body = else_body


class _WhileNode:
    __slots__ = ("cond", "body", "iters")
    MAX_ITERS = 1000

    def __init__(self, cond: str, body: str):
        self.cond = cond
        self.body = body
        self.iters = 0


class _ForNode:
    """Runs ONE iteration per worklist pop, re-pushing itself — so the
    node doubles as the loop marker EXIT/CONTINUE unwind to (same shape
    as _WhileNode)."""

    __slots__ = ("var", "frm", "to", "reverse", "by", "body", "vals", "idx")
    MAX_RANGE = 1000

    def __init__(
        self, var: str, frm: str, to: str, reverse: bool, by: str | None, body: str
    ):
        self.var = var
        self.frm = frm  # start-bound expression (the higher one under REVERSE)
        self.to = to
        self.reverse = reverse
        self.by = by  # optional positive step expression (plpgsql BY)
        self.body = body
        self.vals: range | None = None  # bounds evaluate on first pop
        self.idx = 0


class _ForQueryNode:
    """``FOR rec IN <query> LOOP``: per-row iteration over a CONTROL
    TABLE — plpgsql's own semantics run the body once per result row on
    the coordinator, so the bounded driver-side ``take`` here is the
    faithful (and only) implementation, the same legitimate
    O(small)-result class as the JDBC-bounds lookups. The query
    evaluates ONCE at loop entry; more than MAX_ROWS rows raise (a
    row-per-fact loop is a misuse of the construct at any engine).
    ``rec.field`` references substitute as typed literals per row."""

    __slots__ = ("var", "query", "body", "rows", "fields", "idx")
    MAX_ROWS = 1000

    def __init__(self, var: str, query: str, body: str):
        self.var = var
        self.query = query
        self.body = body
        self.rows: list | None = None
        self.fields: list[tuple[str, str]] = []
        self.idx = 0


class _CallEnd:
    """Marks the end of a CALL expansion on the worklist: a no-op when
    popped normally, the unwind target for early RETURN, and the fence
    EXIT/CONTINUE must not cross. When the CALL has INOUT parameters it
    carries their (name, type) list plus the call scope, so the
    fall-through and RETURN sites can materialize the one-row result a
    TOP-LEVEL Redshift CALL returns (``nested`` suppresses it — an
    inner CALL's INOUT row is not a script result in Redshift) and
    apply ``writebacks``: a nested CALL that passed a caller VARIABLE
    as an INOUT argument copies the final value back into it, plpgsql's
    by-reference contract. A guard catching mid-proc drops the marker —
    an aborted CALL returns nothing and writes nothing back, also
    Redshift's behavior."""

    __slots__ = ("inout", "scope", "nested", "writebacks")

    def __init__(self, inout=(), scope=None, nested=False, writebacks=()):
        self.inout = tuple(inout)
        self.scope = scope
        self.nested = nested
        # (caller_scope, caller_var, param_name) triples
        self.writebacks = tuple(writebacks)


def _inout_result(spark: SparkSession, ce: "_CallEnd"):
    """Finish an INOUT-bearing CALL: apply variable write-backs into the
    caller's scope, then return the one-row DataFrame of final INOUT
    values for a top-level CALL (None for a nested one — Redshift only
    surfaces the outermost CALL's row). The row goes through the
    dialect front-end so Redshift type spellings in the signature
    (DOUBLE PRECISION, CHAR(n), ...) cast correctly."""
    for caller_scope, caller_var, pname in ce.writebacks:
        caller_scope[caller_var][1] = ce.scope[pname][1]
    if ce.nested:
        return None
    return spark.sql(
        translate_redshift_sql(
            "SELECT "
            + ", ".join(
                f"{_sql_literal(ce.scope[n][1], t)} AS {n}" for n, t in ce.inout
            )
        ).strip()
    )


def _mask_quoted(text: str) -> str:
    """Copy of *text* with single-quoted literal contents blanked, so
    keyword/semicolon scans cannot match inside strings ('' escapes
    toggle twice, landing back in-literal)."""
    out = list(text)
    in_q = False
    for i, ch in enumerate(text):
        if ch == "'":
            in_q = not in_q
        elif in_q:
            out[i] = " "
    return "".join(out)


# One token scanner drives all block matching. Order matters: END IF /
# END LOOP before END (CASE closer), IF EXISTS / IF NOT EXISTS (DDL
# modifiers, no block) before IF. WHILE/FOR heads don't open a block —
# their LOOP keyword does.
_CTRL_TOKEN = re.compile(
    r"(?is)\b(?:(?P<endcase>END\s+CASE)|(?P<endif>END\s+IF)"
    r"|(?P<endloop>END\s+LOOP)"
    r"|(?P<ifx>IF\s+(?:NOT\s+)?EXISTS)|(?P<if>IF)|(?P<loop>LOOP)"
    r"|(?P<then>THEN)|(?P<elsif>ELSIF|ELSEIF)|(?P<else>ELSE)"
    r"|(?P<case>CASE)|(?P<end>END))\b"
)


def _consume_semi(text: str, j: int) -> int:
    n = len(text)
    while j < n and text[j].isspace():
        j += 1
    return j + 1 if j < n and text[j] == ";" else j


def _parse_if(text: str, masked: str, start: int) -> tuple[_IfNode, int]:
    """Parse ``IF cond THEN ... [ELSIF ...] [ELSE ...] END IF`` starting
    at *start* (the IF keyword). Returns the node and the index past the
    closing ``END IF;``."""
    stack = 1  # IF/LOOP nesting relative to this IF
    case_depth = 0  # CASE expressions carry their own THEN/ELSE/END
    branches: list[tuple[str, str]] = []
    cond_start = start + 2
    seg_cond: str | None = None
    body_start: int | None = None
    else_start: int | None = None
    for m in _CTRL_TOKEN.finditer(masked, start + 2):
        kind = m.lastgroup
        if kind == "case":
            case_depth += 1
        elif kind in ("end", "endcase"):
            if case_depth > 0:
                case_depth -= 1
        elif kind == "if":
            stack += 1
        elif kind == "loop":
            stack += 1
        elif kind == "endloop":
            stack -= 1
        elif kind == "endif":
            stack -= 1
            if stack == 0:
                if else_start is not None:
                    else_body: str | None = text[else_start : m.start()]
                elif body_start is not None:
                    branches.append((seg_cond, text[body_start : m.start()]))
                    else_body = None
                else:
                    raise ValueError(f"IF: missing THEN near {text[start:start + 60]!r}")
                return _IfNode(branches, else_body), _consume_semi(text, m.end())
        elif stack == 1 and case_depth == 0 and else_start is None:
            if kind == "then" and body_start is None:
                seg_cond = text[cond_start : m.start()].strip()
                if not seg_cond:
                    raise ValueError("IF/ELSIF: empty condition")
                body_start = m.end()
            elif kind == "elsif":
                if body_start is None:
                    raise ValueError("ELSIF before THEN")
                branches.append((seg_cond, text[body_start : m.start()]))
                cond_start, seg_cond, body_start = m.end(), None, None
            elif kind == "else":
                if body_start is None:
                    raise ValueError("ELSE before THEN")
                branches.append((seg_cond, text[body_start : m.start()]))
                else_start = m.end()
    raise ValueError(f"IF: missing END IF near {text[start:start + 60]!r}")


def _find_block_close(masked: str, pos: int, want: str, what: str) -> re.Match:
    """Match for the END IF/END LOOP closing the block open at *pos*."""
    stack = 1
    for m in _CTRL_TOKEN.finditer(masked, pos):
        kind = m.lastgroup
        if kind in ("if", "loop"):
            stack += 1
        elif kind in ("endif", "endloop"):
            stack -= 1
            if stack == 0:
                if kind != want:
                    raise ValueError(f"{what}: mismatched block closer")
                return m
    raise ValueError(f"{what}: missing END LOOP")


def _sub_skip_shadowed(body: str, var: str, pattern: str, repl) -> str:
    """``_sub_outside_quotes`` applied plpgsql-SCOPED for a loop
    variable *var*: a nested ``FOR <same-name> IN`` REBINDS the name, so
    the nested loop's BODY is skipped (the inner variable shadows the
    outer there), while the nested loop's range-bound / control-query
    text still substitutes (both evaluate in the enclosing scope, where
    the name is the outer variable). Shared by the integer range-FOR
    substitution and the record-FOR ``var.field`` substitution — the r9
    review found the shadowing bug existed identically in both paths.
    Quoted literals are never touched (same discipline as _subst_vars)."""
    masked = _mask_quoted(body)
    shadow = re.compile(rf"(?is)\bFOR\s+{re.escape(var)}\s+IN\b")
    loop_tok = re.compile(r"(?is)\bLOOP\b")

    def _sub(seg: str) -> str:
        return _sub_outside_quotes(seg, pattern, repl)

    out, pos = [], 0
    while m := shadow.search(masked, pos):
        lm = loop_tok.search(masked, m.end())
        if lm is None:
            break  # malformed header — the downstream parser raises loudly
        em = _find_block_close(masked, lm.end(), "endloop", "FOR")
        out.append(_sub(body[pos : m.start()]))  # text before the nested loop
        out.append(body[m.start() : m.end()])  # 'FOR var IN' — name rebinds
        out.append(_sub(body[m.end() : lm.end()]))  # bounds/query + LOOP
        out.append(body[lm.end() : em.end()])  # shadowed body, verbatim
        pos = em.end()
    out.append(_sub(body[pos:]))
    return "".join(out)


def _sub_loop_var(body: str, var: str, val: str) -> str:
    """Substitute a range-FOR loop variable into its body as an integer
    literal, shadow-aware (_sub_skip_shadowed). Found by the
    derandomized r9 property battery: the flat re.sub also mangled the
    nested header into ``FOR 2 IN ...``, whose digit "variable" then
    rewrote integer literals inside the inner body."""
    return _sub_skip_shadowed(
        body,
        var,
        rf"(?i)(?<![\w$]){re.escape(var)}(?![\w$])",
        lambda _m, _v=val: _v,
    )


def _parse_while(text: str, masked: str, start: int) -> tuple[_WhileNode, int]:
    lm = re.compile(r"(?is)\bLOOP\b").search(masked, start + 5)
    if lm is None:
        raise ValueError(f"WHILE: missing LOOP near {text[start:start + 60]!r}")
    cond = text[start + 5 : lm.start()].strip()
    if not cond:
        raise ValueError("WHILE: empty condition")
    em = _find_block_close(masked, lm.end(), "endloop", "WHILE")
    return _WhileNode(cond, text[lm.end() : em.start()]), _consume_semi(text, em.end())


def _parse_for(text: str, masked: str, start: int) -> tuple[_ForNode, int]:
    lm = re.compile(r"(?is)\bLOOP\b").search(masked, start + 3)
    if lm is None:
        raise ValueError(f"FOR: missing LOOP near {text[start:start + 60]!r}")
    head = text[start + 3 : lm.start()].strip()
    hm = re.match(r"(?is)^(\w+)\s+IN\s+(REVERSE\s+)?(.+)$", head)
    if hm is None:
        raise ValueError(f"FOR: expected 'FOR var IN [REVERSE] a..b LOOP', got {head!r}")
    rng = hm.group(3)
    dots = _mask_quoted(rng).find("..")
    em = _find_block_close(masked, lm.end(), "endloop", "FOR")
    if dots < 0:
        # FOR rec IN <query> LOOP — row iteration over a control table
        if hm.group(2):
            raise ValueError(f"FOR {hm.group(1)}: REVERSE needs an integer range")
        return (
            _ForQueryNode(hm.group(1), rng.strip(), text[lm.end() : em.start()]),
            _consume_semi(text, em.end()),
        )
    to_part, by = rng[dots + 2 :].strip(), None
    if bm := re.match(r"(?is)^(.*?)\sBY\s(.+)$", _mask_quoted(to_part)):
        by = to_part[len(bm.group(1)) + 4 :].strip()
        to_part = to_part[: len(bm.group(1))].strip()
    node = _ForNode(
        hm.group(1),
        rng[:dots].strip(),
        to_part,
        bool(hm.group(2)),
        by,
        text[lm.end() : em.start()],
    )
    return node, _consume_semi(text, em.end())


class _GuardNode:
    """``BEGIN ... [EXCEPTION WHEN OTHERS THEN ...] END`` nested block
    (round 7). With a handler the block is an exception guard: state
    snapshots at entry, every table binding inside materializes eagerly
    (localCheckpoint — errors surface at the statement that caused them,
    not at some later action), and a caught error restores the snapshot
    and runs the handler — plpgsql's own "changes are rolled back"
    contract. Only ``WHEN OTHERS`` is accepted, which is Redshift's own
    restriction (no named conditions). ``SQLERRM``/``SQLSTATE`` in the
    handler substitute the error message / a classified SQLSTATE code.
    Runner-limitation ValueErrors are NOT caught (module policy: loud)."""

    __slots__ = ("body", "handler")

    def __init__(self, body: str, handler: str | None):
        self.body = body
        self.handler = handler


class _GuardEnd:
    """End-of-guarded-block marker: pops as a no-op on clean completion
    (discarding the snapshot); the unwind target when the block errors."""

    __slots__ = ()


class _DeclBlockNode:
    """``DECLARE ... BEGIN ... END`` sub-block (r9): the declared
    scalars enter the enclosing scope at block entry — shadowing
    same-name outer variables — and leave at block exit (the shadowed
    outer value reappears; assignments to NON-declared outer variables
    persist, plpgsql's scoping). Defaults evaluate at EACH entry, in
    order (a loop-contained block re-initializes per iteration, and a
    later default may reference an earlier inner variable; the default
    of a variable that shadows an outer one still sees the OUTER value —
    the inner binding exists only after its own declaration). The BEGIN
    part may carry its own EXCEPTION section (it parses as the same
    _GuardNode). Scalar variables only — a nested CURSOR declaration is
    loud (declare cursors in the procedure's own DECLARE section)."""

    __slots__ = ("decls", "block")

    def __init__(self, decls: list, block: "_GuardNode"):
        self.decls = decls
        self.block = block


_DECL_MISSING = object()


class _DeclEnd:
    """End-of-DECLARE-block marker: restores the shadow-saved scope
    entries. Restore also runs when an unwind (EXIT/CONTINUE/RETURN or
    an exception caught by an OUTER guard) skips past the marker — the
    inner names must not leak into code outside the block."""

    __slots__ = ("saved", "scope")

    def __init__(self, saved: dict, scope: dict):
        self.saved = saved
        self.scope = scope

    def restore(self) -> None:
        for name, old in self.saved.items():
            if old is _DECL_MISSING:
                self.scope.pop(name, None)
            else:
                self.scope[name] = old


# Block scanner for BEGIN ... END: unlike _CTRL_TOKEN it also tracks
# nested BEGIN blocks and the EXCEPTION divider. The lookahead on
# EXCEPTION keeps `RAISE EXCEPTION 'msg'` (string follows, not WHEN)
# from reading as a handler divider.
_GUARD_TOKEN = re.compile(
    r"(?is)\b(?:(?P<endcase>END\s+CASE)|(?P<endif>END\s+IF)"
    r"|(?P<endloop>END\s+LOOP)"
    r"|(?P<ifx>IF\s+(?:NOT\s+)?EXISTS)|(?P<if>IF)|(?P<loop>LOOP)"
    r"|(?P<case>CASE)|(?P<begin>BEGIN)"
    r"|(?P<exc>EXCEPTION(?=\s+WHEN\b))|(?P<end>END))\b"
)

_HANDLER_HEAD = re.compile(r"(?is)^\s*WHEN\s+OTHERS\s+THEN\b(.*)$")


# plpgsql CASE *statement* (r7): both the searched form
# (CASE WHEN cond THEN stmts ... END CASE) and the simple form
# (CASE expr WHEN v1 [, v2] THEN stmts ... END CASE), desugared into the
# proven _IfNode machinery. plpgsql semantics kept: the simple form
# compares with = (spelled IN for value lists — NULL never matches,
# same as plpgsql), and a CASE with no matching branch and no ELSE
# RAISEs case_not_found instead of falling through.
_CASE_TOKEN = re.compile(
    r"(?is)\b(?:(?P<endcase>END\s+CASE)|(?P<endif>END\s+IF)"
    r"|(?P<endloop>END\s+LOOP)|(?P<ifx>IF\s+(?:NOT\s+)?EXISTS)"
    r"|(?P<if>IF)|(?P<loop>LOOP)|(?P<begin>BEGIN)|(?P<case>CASE)"
    r"|(?P<when>WHEN)|(?P<then>THEN)|(?P<else>ELSE)|(?P<end>END))\b"
)

_CASE_NOT_FOUND_MSG = "CASE statement: no matching branch (case_not_found)"
_CASE_NOT_FOUND = f"RAISE EXCEPTION '{_CASE_NOT_FOUND_MSG}'"


def _parse_case_stmt(text: str, masked: str, start: int) -> tuple[_IfNode, int]:
    """Parse a CASE statement starting at *start* (the CASE keyword) into
    an _IfNode. Branch WHENs are recognized only at this CASE's own
    level; a WHEN directly preceded by EXIT/CONTINUE (loop control) or
    followed by [NOT] MATCHED (a MERGE inside an arm — wrap it in
    BEGIN...END, documented subset) is not a branch divider."""
    stack = 1
    head_start = start + 4
    search_expr: str | None = None
    branches: list[tuple[str, str]] = []
    seen_first_when = False
    when_start: int | None = None
    cur_when: str | None = None
    body_start: int | None = None
    else_start: int | None = None
    for m in _CASE_TOKEN.finditer(masked, head_start):
        kind = m.lastgroup
        if kind == "ifx":
            continue
        if kind in ("if", "loop", "begin", "case"):
            stack += 1
            continue
        if kind in ("endif", "endloop", "end"):
            stack -= 1
            continue
        if kind == "endcase":
            stack -= 1
            if stack > 0:
                continue
            if else_start is not None:
                else_body: str | None = text[else_start : m.start()]
            elif body_start is not None:
                branches.append((cur_when, text[body_start : m.start()]))
                else_body = _CASE_NOT_FOUND  # plpgsql raises case_not_found
            else:
                raise ValueError(
                    f"CASE statement: no WHEN branch near {text[start:start + 60]!r}"
                )
            if search_expr:
                branches = [(f"({search_expr}) IN ({w})", b) for w, b in branches]
            return _IfNode(branches, else_body), _consume_semi(text, m.end())
        if stack != 1 or else_start is not None:
            continue
        if kind == "when":
            if re.search(r"(?is)\b(EXIT|CONTINUE)\s*$", text[:m.start()]):
                continue  # EXIT/CONTINUE WHEN inside a branch body
            if re.match(r"(?is)WHEN\s+(?:NOT\s+)?MATCHED\b", text[m.start():]):
                continue  # a MERGE clause, not a branch divider
            if not seen_first_when:
                seen_first_when = True
                head = text[head_start : m.start()].strip()
                search_expr = head or None
            elif body_start is not None:
                branches.append((cur_when, text[body_start : m.start()]))
            when_start, body_start = m.end(), None
        elif kind == "then":
            if when_start is not None and body_start is None:
                cur_when = text[when_start : m.start()].strip()
                if not cur_when:
                    raise ValueError("CASE statement: empty WHEN")
                body_start = m.end()
        elif kind == "else":
            if body_start is None:
                raise ValueError("CASE statement: ELSE before any WHEN ... THEN")
            branches.append((cur_when, text[body_start : m.start()]))
            body_start = None
            else_start = m.end()
    raise ValueError(f"CASE statement: missing END CASE near {text[start:start + 60]!r}")


def _parse_begin_block(text: str, masked: str, start: int) -> tuple[_GuardNode, int]:
    """Parse ``BEGIN ... [EXCEPTION WHEN OTHERS THEN ...] END`` starting
    at *start* (the BEGIN keyword). Returns the node and the index past
    the closing ``END;``."""
    stack = ["begin"]
    exc_span: tuple[int, int] | None = None
    for m in _GUARD_TOKEN.finditer(masked, start + 5):
        kind = m.lastgroup
        if kind == "ifx":
            continue
        if kind in ("if", "loop", "case", "begin"):
            stack.append(kind)
        elif kind == "endif":
            if not stack or stack.pop() != "if":
                raise ValueError("BEGIN block: mismatched END IF")
        elif kind == "endloop":
            if not stack or stack.pop() != "loop":
                raise ValueError("BEGIN block: mismatched END LOOP")
        elif kind == "endcase":
            if not stack or stack.pop() != "case":
                raise ValueError("BEGIN block: mismatched END CASE")
        elif kind == "exc":
            if len(stack) == 1:
                if exc_span is not None:
                    raise ValueError("BEGIN block: multiple EXCEPTION sections")
                exc_span = (m.start(), m.end())
        elif kind == "end":
            top = stack.pop()
            if top not in ("case", "begin"):
                raise ValueError(f"BEGIN block: END closes an open {top.upper()}")
            if not stack:
                if exc_span is not None:
                    body = text[start + 5 : exc_span[0]]
                    hm = _HANDLER_HEAD.match(text[exc_span[1] : m.start()])
                    if hm is None:
                        raise ValueError(
                            "EXCEPTION: only 'WHEN OTHERS THEN ...' is "
                            "supported (Redshift's own restriction — no "
                            "named conditions)"
                        )
                    return _GuardNode(body, hm.group(1)), _consume_semi(text, m.end())
                return _GuardNode(text[start + 5 : m.start()], None), _consume_semi(
                    text, m.end()
                )
    raise ValueError(f"BEGIN block: missing END near {text[start:start + 60]!r}")


def _toplevel_exception(masked_body: str) -> bool:
    """True when a procedure body (outer BEGIN/END already stripped)
    carries an EXCEPTION divider at its own top level — the common
    real-proc form ``BEGIN work EXCEPTION WHEN OTHERS THEN cleanup END``.
    Depth-0 scan over quote-masked text."""
    depth = 0
    for m in _GUARD_TOKEN.finditer(masked_body):
        kind = m.lastgroup
        if kind == "ifx":
            continue
        if kind in ("if", "loop", "case", "begin"):
            depth += 1
        elif kind in ("endif", "endloop", "endcase", "end"):
            depth -= 1
        elif kind == "exc" and depth == 0:
            return True
    return False


def _sqlerrm(exc: BaseException) -> str:
    """SQLERRM substitution text: a single-quoted SQL literal of the
    error's first line (RAISE's own prefix stripped — plpgsql's SQLERRM
    is the raised message, not the transport wrapper)."""
    msg = str(exc)
    if msg.startswith("RAISE EXCEPTION: "):
        msg = msg[len("RAISE EXCEPTION: ") :]
    msg = msg.split("\n", 1)[0][:256]
    return "'" + msg.replace("'", "''") + "'"


def _classify_sqlstate(exc: BaseException) -> str:
    """Map an execution error to the SQLSTATE plpgsql would report:
    20000 case_not_found (a CASE statement with no matching branch and
    no ELSE — routed through the runner's own RAISE sentinel), P0001
    raise_exception, P0002 no_data_found / P0003 too_many_rows (SELECT
    INTO STRICT violations — r12), 22012 division_by_zero, 22P02 invalid text
    representation (a failed cast from a malformed string — Postgres/
    Redshift report 22P02 there, NOT 22018), 22003 numeric out of range
    (including a cast that overflows its target — Postgres raises
    'integer out of range' 22003 there, so CAST_OVERFLOW maps here too,
    not to 22018); XX000 (internal_error) otherwise."""
    msg = str(exc)
    if isinstance(exc, RuntimeError) and msg.startswith("RAISE EXCEPTION"):
        if msg == f"RAISE EXCEPTION: {_CASE_NOT_FOUND_MSG}":
            return "20000"
        return "P0001"
    if isinstance(exc, RuntimeError) and msg.startswith("SELECT INTO STRICT"):
        # plpgsql: no_data_found / too_many_rows
        return "P0002" if "no rows" in msg else "P0003"
    if "DIVIDE_BY_ZERO" in msg or "Division by zero" in msg:
        return "22012"
    if "CAST_INVALID_INPUT" in msg:
        return "22P02"
    if (
        "CAST_OVERFLOW" in msg
        or "NUMERIC_VALUE_OUT_OF_RANGE" in msg
        or "ARITHMETIC_OVERFLOW" in msg
    ):
        return "22003"
    return "XX000"


def _parse_plpgsql_nodes(text: str) -> list:
    """Split a procedure body into executable items: plain SQL statement
    strings interleaved with control nodes (each block's body stays raw
    text, re-parsed when the block runs)."""
    nodes: list = []
    masked = _mask_quoted(text)
    i, n = 0, len(text)
    while i < n:
        while i < n and (text[i].isspace() or text[i] == ";"):
            i += 1
        if i >= n:
            break
        m = re.match(r"(?i)(IF|WHILE|FOR|LOOP|BEGIN|DECLARE|CASE)\b", masked[i:])
        kw = m.group(1).upper() if m else None
        if kw == "DECLARE":
            # r9: DECLARE ... BEGIN ... END sub-block. The declarations
            # run from DECLARE to the block's BEGIN; the block itself
            # (including an optional EXCEPTION section) parses as the
            # ordinary _GuardNode.
            bm = re.compile(r"(?i)\bBEGIN\b").search(masked, i + 7)
            if bm is None:
                raise ValueError(
                    "plpgsql: DECLARE without a following BEGIN block"
                )
            decls = _parse_proc_decls(text[i + 7 : bm.start()], "nested block")
            if any(t == "CURSOR" for _n, t, _d in decls):
                raise ValueError(
                    "plpgsql: a nested-block DECLARE supports scalar "
                    "variables only — declare cursors in the procedure's "
                    "own DECLARE section"
                )
            node, i = _parse_begin_block(text, masked, bm.start())
            nodes.append(_DeclBlockNode(decls, node))
            continue
        if kw == "BEGIN":
            node, i = _parse_begin_block(text, masked, i)
            nodes.append(node)
        elif kw == "CASE":
            node, i = _parse_case_stmt(text, masked, i)
            nodes.append(node)
        elif kw == "IF":
            node, i = _parse_if(text, masked, i)
            nodes.append(node)
        elif kw == "WHILE":
            node, i = _parse_while(text, masked, i)
            nodes.append(node)
        elif kw == "FOR":
            node, i = _parse_for(text, masked, i)
            nodes.append(node)
        elif kw == "LOOP":
            # bare LOOP ... END LOOP: an unconditional loop — EXIT is
            # its only way out (the iteration cap backstops a miss)
            em = _find_block_close(masked, i + 4, "endloop", "LOOP")
            nodes.append(_WhileNode("TRUE", text[i + 4 : em.start()]))
            i = _consume_semi(text, em.end())
        else:
            j = masked.find(";", i)
            if j == -1:
                j = n
            stmt = text[i:j].strip()
            if stmt:
                if bm := re.match(
                    r"(?i)(ELSIF|ELSEIF|ELSE|THEN|END\s+IF|END\s+LOOP)\b", stmt
                ):
                    # a block keyword with no open block — loud misparse
                    raise ValueError(
                        f"plpgsql: misplaced {bm.group(1).upper()} "
                        f"near {stmt[:60]!r}"
                    )
                nodes.append(stmt)
            i = j + 1
    return nodes


# --- plpgsql variables (round 6) -------------------------------------------
# DECLARE section + `var := expr` + `SELECT ... INTO var[, ...]`.
# Variables are DRIVER-SIDE scalars: each use-site substitutes the
# current value as a typed SQL literal (CAST('..' AS type)), so Catalyst
# sees constants — exactly how plpgsql binds values into SQL. Statements
# expanded from a CALL carry their scope in a _Scoped wrapper; values
# substitute when the statement RUNS, not when the body parses (a later
# assignment changes what later statements see). plpgsql's own hazard
# applies: a variable named like a column would capture the column
# reference — name variables v_* as plpgsql style guides do.


class _Scoped:
    __slots__ = ("item", "scope")

    def __init__(self, item, scope: dict):
        self.item = item
        self.scope = scope  # lower-cased name -> [normalized type, value]


class _Cursor:
    """Forward-only plpgsql cursor (r7): the DECLAREd query evaluates at
    OPEN with the variable values of that moment, buffering at most
    MAX_ROWS rows driver-side — the same bounded control-table contract
    as _ForQueryNode (plpgsql row loops run on the coordinator by the
    language's own semantics; a per-fact cursor is a misuse at any
    engine). FETCH walks the buffer; CLOSE releases it. SCROLL,
    parameterized cursors, and ``FETCH <count>`` are outside the subset
    (loud at DECLARE / unsupported-statement time)."""

    __slots__ = ("query", "rows", "fields", "idx")
    MAX_ROWS = 1000

    def __init__(self, query: str):
        self.query = query
        self.rows: list | None = None  # None = closed
        self.fields: list[tuple[str, str]] = []
        self.idx = 0


_CURSOR_DECL = re.compile(r"(?is)^([\w$]+)\s+(?:NO\s+SCROLL\s+)?CURSOR\s+FOR\s+(.+)$")


def _parse_proc_decls(decls: str, proc: str) -> list[tuple[str, str, str | None]]:
    """DECLARE entries as (name, normalized type, default expr | None).
    A ``name CURSOR FOR <query>`` entry comes back as (name, "CURSOR",
    query). Records/aliases/SCROLL/parameterized cursors are outside the
    subset (loud). *proc* is the error-message context (the procedure
    name, or "nested block" for a r9 DECLARE sub-block)."""
    ctx = proc if proc == "nested block" else f"CREATE PROCEDURE {proc}"
    out: list[tuple[str, str, str | None]] = []
    seen: set[str] = set()
    for d in _split_top_semis(decls):
        d = d.strip()
        if not d:
            continue
        # an executable statement in the DECLARE section means the
        # DECLARE/BEGIN split mis-scoped (e.g. statements between a
        # nested DECLARE and a LATER BEGIN) — swallowing it as a
        # "declaration" would silently drop DML (r9 review; loud-never-
        # silent policy). Variable names can't be these reserved words.
        if re.match(
            r"(?i)^(INSERT|UPDATE|DELETE|SELECT|CREATE|DROP|CALL|SET|COPY"
            r"|UNLOAD|MERGE|TRUNCATE|RAISE|IF|WHILE|FOR|LOOP|EXIT|CONTINUE"
            r"|RETURN|PERFORM|OPEN|FETCH|CLOSE|EXECUTE|GET|BEGIN|ALTER"
            r"|GRANT|REVOKE|COMMENT|LOCK|VACUUM|ANALYZE)\b",
            d,
        ):
            raise ValueError(
                f"{ctx}: only declarations may appear between DECLARE and "
                f"BEGIN, found statement {d[:50]!r}"
            )
        if cm := _CURSOR_DECL.match(d):
            if cm.group(1).lower() in seen:
                raise ValueError(
                    f"{ctx}: duplicate declaration of {cm.group(1).lower()!r}"
                )
            seen.add(cm.group(1).lower())
            out.append((cm.group(1).lower(), "CURSOR", cm.group(2).strip()))
            continue
        if re.search(r"(?i)\b(CURSOR|RECORD|REFCURSOR|CONSTANT|ALIAS)\b", _mask_quoted(d)):
            raise ValueError(
                f"{ctx}: DECLARE supports scalar variables "
                f"and 'name CURSOR FOR <query>' only, not {d[:50]!r}"
            )
        parts = re.split(r"(?i):=|\bDEFAULT\b", d, maxsplit=1)
        default = parts[1].strip() if len(parts) > 1 else None
        hm = re.match(r"(?s)^([\w$]+)\s+(.+)$", parts[0].strip())
        if hm is None:
            raise ValueError(f"{ctx}: cannot parse DECLARE {d!r}")
        if hm.group(1).lower() in seen:
            # plpgsql raises on a duplicate declaration in one section —
            # last-wins would silently mask the authoring error (r9 review)
            raise ValueError(
                f"{ctx}: duplicate declaration of {hm.group(1).lower()!r}"
            )
        seen.add(hm.group(1).lower())
        out.append((hm.group(1).lower(), _normalize_ddl_types(hm.group(2).strip()), default))
    return out


def _split_top_semis(text: str) -> list[str]:
    masked = _mask_quoted(text)
    parts, start = [], 0
    for i, ch in enumerate(masked):
        if ch == ";":
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


class _LazyFound:
    """plpgsql FOUND after a DML statement, resolved on first READ.
    ROW_COUNT is deliberately lazy (the affected-set DataFrame is
    counted only if GET DIAGNOSTICS asks — see state.last_dml), so
    FOUND defers the same count until a statement actually reads the
    variable, then memoizes the boolean. A body that never reads FOUND
    after a DML pays zero extra jobs."""

    __slots__ = ("_src", "_val")

    def __init__(self, src) -> None:
        self._src, self._val = src, None

    def resolve(self) -> bool:
        if self._val is None:
            src = self._src
            if src is None:
                n = 0
            elif isinstance(src, int):
                n = src
            else:
                n = src.count()
            self._val = n > 0
            self._src = None
        return self._val


def _mark_found_dml(scope: dict | None, state) -> None:
    """plpgsql FOUND after INSERT/UPDATE/DELETE (r12): set only when the
    body declared it (the auto-declare guard bounds the name-capture
    blast radius), and lazily — the captured affected-set is this
    statement's pre-rebind view, same snapshot ROW_COUNT reports.
    EXECUTE deliberately does NOT route here (plpgsql: EXECUTE changes
    GET DIAGNOSTICS but never FOUND); TRUNCATE/MERGE likewise (not in
    plpgsql's FOUND-setting list)."""
    if scope is not None and "found" in scope:
        scope["found"][1] = _LazyFound(state.last_dml)


def _sql_literal(value, typ: str) -> str:
    """A Python scalar as a typed SQL literal (the CAST keeps the
    variable's declared type at every use site)."""
    if isinstance(value, _LazyFound):
        value = value.resolve()
    if value is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(value, bool):
        return f"CAST({'TRUE' if value else 'FALSE'} AS BOOLEAN)"
    if isinstance(value, str):
        # Spark's default parser processes backslash escapes inside string
        # literals ('C:\temp' would gain a tab), so backslashes must be
        # doubled BEFORE quote doubling for the value to round-trip.
        escaped = value.replace("\\", "\\\\").replace(chr(39), chr(39) * 2)
        return f"CAST('{escaped}' AS {typ})"
    if isinstance(value, (bytes, bytearray, list, dict)):
        raise ValueError(f"plpgsql variable of unsupported runtime type {type(value).__name__}")
    return f"CAST('{value}' AS {typ})"  # numerics/Decimal/date/timestamp via str()


def _subst_vars(scope: dict, sql: str) -> str:
    for name, cell in scope.items():
        if cell[0] == "CURSOR":
            continue  # cursor names are statement operands, not scalars

        # callable repl, and the literal renders ONLY on a match: a
        # plain-string repl would re-interpret the literal's doubled
        # backslashes as re.sub group escapes, and an eager render would
        # force a _LazyFound's count job for statements that never
        # mention the variable (memoized back into the cell on first
        # read).
        def _repl(_m, _cell=cell):
            v = _cell[1]
            if isinstance(v, _LazyFound):
                v = _cell[1] = v.resolve()
            return _sql_literal(v, _cell[0])

        sql = _sub_outside_quotes(
            sql, rf"(?i)(?<![\w$]){re.escape(name)}(?![\w$])", _repl
        )
    return sql


# `var := expr;` — plpgsql assignment (also the `var = expr` spelling
# plpgsql accepts, but only via :=, to keep SET/UPDATE unambiguous here)
_ASSIGN = re.compile(r"^([\w$]+)\s*:=\s*(.+)$", re.DOTALL)


# RAISE [level] 'format' [, arg...]: EXCEPTION (the default) aborts the
# script with the %-formatted message; NOTICE/INFO/WARNING/LOG/DEBUG are
# log-channel levels with no script-visible effect — accepted no-ops.
_RAISE = re.compile(
    r"^RAISE\s+(?:(EXCEPTION|NOTICE|INFO|WARNING|LOG|DEBUG)\s+)?"
    r"'((?:[^']|'')*)'\s*(?:,(.*))?$",
    re.IGNORECASE | re.DOTALL,
)


def _format_raise_message(msg: str, vals: list[str]) -> str:
    """plpgsql %-placeholders consume args in order; %% is a literal %.
    Arity mismatches are errors (plpgsql's own contract)."""
    out: list[str] = []
    it = iter(vals)
    i, n = 0, len(msg)
    used = 0
    while i < n:
        ch = msg[i]
        if ch == "%":
            if i + 1 < n and msg[i + 1] == "%":
                out.append("%")
                i += 2
                continue
            try:
                out.append(next(it))
                used += 1
            except StopIteration:
                raise ValueError(f"RAISE: too few parameters for format {msg!r}")
            i += 1
        else:
            out.append(ch)
            i += 1
    if used != len(vals):
        raise ValueError(f"RAISE: too many parameters for format {msg!r}")
    return "".join(out)


_TRUNCATE = re.compile(r"^TRUNCATE\s+(?:TABLE\s+)?([\w.]+)\s*$", re.IGNORECASE)
# DROP takes a comma list ("DROP TABLE IF EXISTS stage1, stage2") and
# CASCADE/RESTRICT tails; MATERIALIZED VIEW drops route here too.
_DROP = re.compile(
    r"^DROP\s+(?:TABLE|(?:MATERIALIZED\s+)?VIEW)\s+(?:IF\s+EXISTS\s+)?"
    r"([\w.]+(?:\s*,\s*[\w.]+)*)\s*(?:CASCADE|RESTRICT)?\s*$",
    re.IGNORECASE,
)
# Redshift materialized views: CREATE binds the defining query as a
# snapshot (spark.sql analyzes eagerly, so the plan pins the base
# tables as of bind time — Redshift's stale-until-refreshed contract);
# REFRESH re-runs the stored definition against current bindings.
# AUTO REFRESH / BACKUP clauses are accepted and ignored.
_CREATE_MV = re.compile(
    r"^CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*"
    r"(?:BACKUP\s+(?:YES|NO)\s*)?(?:AUTO\s+REFRESH\s+(?:YES|NO)\s*)?"
    r"AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV = re.compile(
    r"^REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*$", re.IGNORECASE
)
_QUERY = re.compile(r"^(SELECT|WITH|VALUES)\b", re.IGNORECASE)
_COPY = re.compile(r"^COPY\s+([\w.]+)\s+FROM\s+'([^']+)'\s*(.*)$", re.IGNORECASE | re.DOTALL)
_UNLOAD = re.compile(
    r"^UNLOAD\s*\(\s*'(.+)'\s*\)\s*TO\s+'([^']+)'\s*(.*)$", re.IGNORECASE | re.DOTALL
)

# COPY/UNLOAD option clauses. Auth/transport clauses (IAM_ROLE,
# CREDENTIALS, REGION, ENCRYPTED) are accepted and ignored — they select
# S3 credentials, which Spark's filesystem layer owns (hadoop-aws conf),
# not the statement. Everything unrecognized raises: a silently dropped
# COMPUPDATE or MAXERROR would change semantics without a trace.
_OPT_TOKEN = re.compile(
    r"""
    FORMAT\s+AS\s+JSON\s+'(?P<jsonspec2>[^']*)'
    | JSON\s+'(?P<jsonspec>[^']*)'
    | FORMAT\s+AS\s+(?P<fmt2>CSV|JSON|PARQUET)
    | (?P<fmt>CSV|JSON|PARQUET)\b
    | IGNOREHEADER\s+(?:AS\s+)?(?P<skip>\d+)
    | DELIMITER\s+(?:AS\s+)?'(?P<delim>[^']*)'
    | PARTITION\s+BY\s*\((?P<part>[^)]*)\)
    | (?P<header>HEADER)\b
    | (?P<overwrite>ALLOWOVERWRITE)\b
    | PARALLEL\s+(?P<parallel>ON|OFF|TRUE|FALSE)
    | (?P<manifest>MANIFEST)\b
    | (?P<codec>GZIP|BZIP2|ZSTD)\b
    | MAXFILESIZE\s+(?:AS\s+)?(?P<maxfs>\d+(?:\.\d+)?)\s*(?P<maxfsunit>MB|GB)?
    | EXPLICIT_IDS\b
    | FIXEDWIDTH\s+(?:AS\s+)?'(?P<fixedwidth>[^']*)'
    | MAXERROR\s+(?:AS\s+)?(?P<maxerror>\d+)
    | DATEFORMAT\s+(?:AS\s+)?'(?P<datefmt>[^']*)'
    | TIMEFORMAT\s+(?:AS\s+)?'(?P<timefmt>[^']*)'
    | NULL\s+(?:AS\s+)?'(?P<nullas>[^']*)'
    | ACCEPTINVCHARS(?:\s+(?:AS\s+)?'(?P<invchar>[^']*)')?
    | (?P<removequotes>REMOVEQUOTES)\b
    | QUOTE\s+(?:AS\s+)?'(?P<quotechar>[^']*)'
    | (?P<addquotes>ADDQUOTES)\b
    | (?P<cleanpath>CLEANPATH)\b
    | ACCEPTANYDATE\b              # PERMISSIVE parsing already nulls unparseable dates
    | ESCAPE\b                     # Spark's CSV reader already honors backslash escapes
    | (?P<blanksasnull>BLANKSASNULL)\b
    | (?P<trimblanks>TRIMBLANKS)\b
    | (?P<emptyasnull>EMPTYASNULL)\b
    | (?P<ignoreblank>IGNOREBLANKLINES)\b
    | TRUNCATECOLUMNS\b            # strings are unbounded here: nothing to truncate
    | (?:COMPUPDATE|STATUPDATE)(?:\s+(?:ON|OFF|TRUE|FALSE))?\b  # warehouse maintenance flags
    | ENCRYPTED\b                  # storage-layer concern (S3 SSE analog)
    | (?:IAM_ROLE|CREDENTIALS|REGION|ACCESS_KEY_ID|SECRET_ACCESS_KEY|SESSION_TOKEN)\s+'[^']*'
    | \s+
    """,
    re.IGNORECASE | re.VERBOSE,
)


def _parse_io_options(clause: str, stmt_kind: str) -> dict:
    opts: dict = {"format": None, "header": False, "skip": 0, "delimiter": None,
                  "partition_by": [], "overwrite": False, "parallel": True,
                  "manifest": False, "codec": None, "null_as": None,
                  "fixedwidth": None, "maxerror": None,
                  "datefmt": None, "timefmt": None, "maxfilesize": None,
                  "blanksasnull": False, "trimblanks": False,
                  "emptyasnull": False, "ignoreblank": False,
                  "invchar": None, "removequotes": False,
                  "quotechar": None, "addquotes": False, "cleanpath": False,
                  "jsonpaths": None}
    pos = 0
    while pos < len(clause):
        m = _OPT_TOKEN.match(clause, pos)
        if m is None or m.end() == pos:
            raise ValueError(
                f"unsupported {stmt_kind} option near: {clause[pos:pos + 40]!r}"
            )
        if fmt := (m.group("fmt2") or m.group("fmt")):
            opts["format"] = fmt.upper()
        spec = m.group("jsonspec2") or m.group("jsonspec")
        if spec is not None:
            # COPY ... [FORMAT AS] JSON '<spec>' — Redshift's spec string
            # is either 'auto' / 'auto ignorecase' (load by matching
            # field names, the engine default here) or the path of a
            # jsonpaths control file mapping expressions onto the target
            # columns positionally (readers.read_json_with_paths).
            opts["format"] = "JSON"
            if " ".join(spec.lower().split()) not in ("auto", "auto ignorecase"):
                opts["jsonpaths"] = spec
        if m.group("skip"):
            opts["skip"] = int(m.group("skip"))
        if m.group("delim"):
            opts["delimiter"] = m.group("delim")
        if m.group("part"):
            opts["partition_by"] = [c.strip() for c in m.group("part").split(",") if c.strip()]
        if m.group("header"):
            opts["header"] = True
        if m.group("overwrite"):
            opts["overwrite"] = True
        if m.group("parallel"):
            opts["parallel"] = m.group("parallel").upper() in ("ON", "TRUE")
        if m.group("manifest"):
            opts["manifest"] = True
        if m.group("codec"):
            opts["codec"] = m.group("codec").lower()
        if m.group("nullas") is not None:
            opts["null_as"] = m.group("nullas")
        if m.group("fixedwidth") is not None:
            opts["fixedwidth"] = m.group("fixedwidth")
        if m.group("maxerror") is not None:
            opts["maxerror"] = int(m.group("maxerror"))
        if m.group("datefmt") is not None:
            opts["datefmt"] = m.group("datefmt")
        if m.group("timefmt") is not None:
            opts["timefmt"] = m.group("timefmt")
        for flag in ("blanksasnull", "trimblanks", "emptyasnull", "ignoreblank",
                     "removequotes", "addquotes", "cleanpath"):
            if m.group(flag):
                opts[flag] = True
        if m.group("quotechar") is not None:
            opts["quotechar"] = m.group("quotechar")
        if m.group(0).upper().startswith("ACCEPTINVCHARS"):
            # default replacement is '?' (Redshift's own default)
            opts["invchar"] = m.group("invchar") or "?"
        if m.group("maxfs") is not None:
            unit = (m.group("maxfsunit") or "MB").upper()
            opts["maxfilesize"] = int(
                float(m.group("maxfs")) * (1 << (30 if unit == "GB" else 20))
            )
        pos = m.end()
    return opts


def _split_top_commas(body: str) -> list[str]:
    """Split on top-level commas (paren/quote-aware)."""
    parts: list[str] = []
    depth, in_quote, start = 0, False, 0
    for i, ch in enumerate(body):
        if ch == "'":
            in_quote = not in_quote
        elif in_quote:
            continue
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return parts


def _split_assignments(body: str) -> list[tuple[str, str]]:
    """Split ``a = e1, b = e2`` on top-level commas (paren/quote-aware)."""
    out = []
    for p in _split_top_commas(body):
        col, _, expr = p.partition("=")
        if not expr:
            raise ValueError(f"malformed SET assignment: {p.strip()!r}")
        out.append((col.strip(), expr.strip()))
    return out


def _split_top_and(body: str) -> list[str]:
    """Split a condition on top-level ``AND`` keywords (paren/quote-aware)."""
    parts: list[str] = []
    rest: str | None = body
    while rest is not None:
        head, rest = _split_top_kw(rest, "AND")
        parts.append(head)
    return parts


class _ScriptState:
    """Tables the script has created/replaced, as name → DataFrame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.created_views: set[str] = set()
        # table -> {identity column: seed} (IDENTITY(seed, step) DDL
        # attribute; values auto-generate on INSERTs that omit the column)
        self.identity_cols: dict[str, dict[str, int]] = {}
        # materialized view -> defining SQL text; a REFRESH re-runs it
        # against the CURRENT bindings (Redshift MVs are stale until
        # REFRESH — spark.sql's eager analysis gives exactly that: the
        # bound plan snapshots the base tables as of bind time)
        self.mv_defs: dict[str, str] = {}
        # procedure -> (IN-param names, straight-line body text)
        self.procs: dict[str, tuple[list[str], str]] = {}
        # schemas declared by CREATE SCHEMA; qualified references
        # flatten to `<schema>__<table>` single-part view names
        self.schemas: set[str] = set()
        # SQL UDFs: function -> (param names, scalar expression text)
        self.funcs: dict[str, tuple[list[str], str]] = {}
        # plpythonu UDFs: function -> (param names, declared param types,
        # returns type, body) — registered with Spark at CREATE; tracked
        # here so DROP, transaction rollback, and end-of-script descoping
        # can tombstone/re-register faithfully
        self.py_funcs: dict[str, tuple[list[str], list[str], str, str]] = {}
        # SET search_path schema order; unqualified references that are
        # not bound plain resolve to the first path schema that has a
        # binding of that name (read-side resolution — see
        # _apply_search_path for the contract and its documented hazard)
        self.search_path: list[str] = []
        # table -> {column: DEFAULT literal SQL text} (CREATE/ALTER DDL
        # attribute; INSERTs that omit the column fill the default, not
        # NULL — Redshift's contract). Lifecycle mirrors identity_cols.
        self.default_cols: dict[str, dict[str, str]] = {}
        # Caller-registered TEMP views a script statement re-binds
        # (DELETE/UPDATE/INSERT/COPY on a base view): captured as
        # resolved DataFrames so cleanup restores them — "shadowed for
        # the script's duration", not destroyed.
        self.shadowed: dict[str, DataFrame] = {}
        # Explicit-transaction snapshot (BEGIN ... COMMIT/ROLLBACK).
        # Bindings are immutable DataFrames, so a snapshot is shallow
        # dict/set copies; ROLLBACK restores them. Single-level, like
        # Redshift (a nested BEGIN is a warning-and-ignore there).
        self.txn_snap: dict | None = None
        # Depth of active EXCEPTION guards (plpgsql BEGIN...EXCEPTION
        # blocks). While > 0, bind() materializes eagerly so execution
        # errors surface at the guarded statement that caused them —
        # honest catch timing under Spark's lazy plans.
        self.guard_depth = 0
        # Rows affected by the last DML, for GET DIAGNOSTICS ROW_COUNT:
        # an int (known), a DataFrame (a LAZY plan of the affected rows,
        # captured at DML time against that moment's bindings — counted
        # only if ROW_COUNT is actually read, so untracked procs pay no
        # extra jobs), or None (last statement's count not tracked —
        # reading it then is loud, never silently stale).
        self.last_dml: DataFrame | int | None = None

    def snapshot(self) -> dict:
        """Shallow state snapshot (bindings are immutable DataFrames, so
        dict/set copies suffice) — shared by explicit transactions and
        EXCEPTION guards."""
        return {
            "tables": dict(self.tables),
            "created_views": set(self.created_views),
            "identity_cols": {k: dict(v) for k, v in self.identity_cols.items()},
            "default_cols": {k: dict(v) for k, v in self.default_cols.items()},
            "mv_defs": dict(self.mv_defs),
            "procs": dict(self.procs),
            "schemas": set(self.schemas),
            "funcs": dict(self.funcs),
            "py_funcs": dict(self.py_funcs),
            "search_path": list(self.search_path),
            "txn_snap": self.txn_snap,
        }

    def txn_begin(self) -> None:
        if self.txn_snap is not None:
            return  # nested BEGIN: Redshift warns and ignores
        snap = self.snapshot()
        snap.pop("txn_snap")
        self.txn_snap = snap

    def txn_commit(self) -> None:
        self.txn_snap = None

    def txn_rollback(self) -> None:
        """Restore every binding and DDL attribute to its BEGIN-time
        snapshot. File side effects (UNLOAD output, JDBC writes) are
        not unwritten — the same contract as Redshift's S3 UNLOADs.
        Outside an explicit transaction ROLLBACK is a no-op (statement
        autocommit: nothing is uncommitted)."""
        if self.txn_snap is None:
            return
        snap, self.txn_snap = self.txn_snap, None
        self.restore(snap)

    def restore(self, snap: dict) -> None:
        """Roll the catalog and every state dict back to *snap* (from
        snapshot() or txn_begin()): views created since then drop — a
        shadowed pre-script view reappears NOW, not at cleanup — and
        every surviving binding re-registers at its snapshot plan."""
        for name in self.created_views - snap["created_views"]:
            self.spark.catalog.dropTempView(name)
            if name in self.shadowed:
                # the pre-script view reappears NOW, not at cleanup
                self.shadowed.pop(name).createOrReplaceTempView(name)
        for name, df in snap["tables"].items():
            df.createOrReplaceTempView(name)
        self.tables = snap["tables"]
        self.created_views = snap["created_views"]
        self.identity_cols = snap["identity_cols"]
        self.default_cols = snap["default_cols"]
        self.mv_defs = snap["mv_defs"]
        self.procs = snap["procs"]
        self.schemas = snap["schemas"]
        self.funcs = snap["funcs"]
        # re-sync Spark's UDF registry with the snapshot: functions
        # created since then tombstone; dropped/replaced ones come back
        for name in set(self.py_funcs) - set(snap["py_funcs"]):
            _register_py_udf_tombstone(self.spark, name)
        for name, spec in snap["py_funcs"].items():
            if self.py_funcs.get(name) != spec:
                _register_python_udf(self.spark, name, *spec)
        self.py_funcs = snap["py_funcs"]
        self.search_path = snap["search_path"]
        if "txn_snap" in snap:
            self.txn_snap = snap["txn_snap"]

    def drop_meta(self, name: str) -> None:
        """A rebind or drop kills per-table DDL attributes."""
        self.identity_cols.pop(name, None)
        self.default_cols.pop(name, None)

    def bind(self, name: str, df: DataFrame) -> None:
        if name not in self.created_views and name not in self.shadowed:
            try:
                t = self.spark.catalog.getTable(name)
                if t.isTemporary:  # catalog tables reappear on their own
                    self.shadowed[name] = self.spark.table(name)
            except Exception:
                pass  # no pre-existing table of that name
        if self.guard_depth:
            # inside an EXCEPTION guard every mutation materializes NOW:
            # a lazy plan would defer e.g. a division error past the
            # guarded block and the handler would never see it. This is
            # the documented cost of honest catch semantics (Redshift
            # itself materializes every statement).
            df = df.localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        self.created_views.add(name)

    def existing(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        # A base table registered outside the script (catalog view).
        return self.spark.table(name)

    def cleanup(self) -> None:
        # Safe after the final spark.sql: analysis is eager, so returned
        # DataFrames hold resolved plans, not view references.
        for name in self.created_views:
            self.spark.catalog.dropTempView(name)
        for name, df in self.shadowed.items():
            df.createOrReplaceTempView(name)
        # plpythonu functions are SCRIPT-scoped, like SQL UDFs (r9 ADVICE:
        # Spark's udf registry is session-global, so without this a
        # function CREATEd here stays callable from later scripts and
        # plain spark.sql). Tombstoning is safe for this script's own
        # returned result: eager analysis already captured the real
        # function in the resolved plan; a later out-of-scope call is
        # loud instead of silently succeeding.
        for name in self.py_funcs:
            _register_py_udf_tombstone(self.spark, name)
        # Release COPY error-budget materializations: the cache's two
        # consumers (MAXERROR count + good/bad split) have served this
        # script's statements; leaving it pinned would hold the whole
        # load in the block-manager for the session (r13 VERDICT item 2).
        from sql_redshift_etl_spark.sources.readers import release_budget_caches

        release_budget_caches()


def _cast_positional(sel: DataFrame, target: DataFrame, table: str) -> DataFrame:
    tgt_schema = target.schema
    if len(sel.columns) != len(tgt_schema):
        raise ValueError(
            f"INSERT INTO {table}: {len(sel.columns)} columns provided, "
            f"table has {len(tgt_schema)}"
        )
    from pyspark.sql import functions as F

    # positional rename FIRST, then cast: an unaliased literal like 0.0
    # yields a column NAMED "0.0", which name-based resolution would
    # parse as `0`.`0` and fail
    sel = sel.toDF(*[f"_pos{i}" for i in range(len(sel.columns))])
    return sel.select(
        *[
            F.col(f"_pos{i}").cast(f.dataType).alias(f.name)
            for i, f in enumerate(tgt_schema.fields)
        ]
    )


def _sub_outside_quotes(text: str, pattern: str, repl) -> str:
    """``re.sub`` applied only OUTSIDE single-quoted string literals, so
    an alias-looking token inside a literal ('t.x is a label') survives."""
    segs = text.split("'")
    segs[0::2] = [re.sub(pattern, repl, s) for s in segs[0::2]]
    return "'".join(segs)


def _apply_search_path(state: "_ScriptState", sql: str) -> str:
    """``SET search_path`` resolution, read-side: an unqualified name
    that has no plain binding rewrites to ``<schema>__<name>`` for the
    FIRST path schema holding that binding (a plain binding always
    shadows the path — Redshift's own resolution order puts earlier
    path entries first, and the script's unqualified CREATEs bind
    plain). Same documented hazard class as declared-schema flattening:
    a bare column named exactly like a path-resolved table would be
    rewritten too; qualify the column to avoid it."""
    for s in state.search_path:
        for bound in list(state.tables):
            if not bound.startswith(f"{s}__"):
                continue
            plain = bound[len(s) + 2 :]
            if plain in state.tables:
                continue
            sql = _sub_outside_quotes(
                sql,
                rf"(?i)(?<![\w.#$]){re.escape(plain)}(?![\w$])(?!\s*\()",
                bound,
            )
    return sql


def _prep_stmt_sql(state: "_ScriptState", sql: str) -> str:
    """The same per-statement text passes the main loop applies (#temp
    rename, declared-schema flattening, search-path resolution, SQL-UDF
    inlining) for SQL built OUTSIDE the loop — control-flow condition
    evaluation."""
    sql = rewrite_temp_names(sql)
    for s in state.schemas:
        sql = _sub_outside_quotes(sql, rf"(?i)\b{re.escape(s)}\s*\.\s*(\w+)", rf"{s}__\1")
    sql = _apply_search_path(state, sql)
    if state.funcs:
        sql = _inline_sql_udfs(sql, state.funcs)
    return sql


def _eval_script_scalar(spark: SparkSession, state: "_ScriptState", expr: str, cast: str):
    """Evaluate a scalar SQL expression (scalar subqueries included) in
    the script's current bindings. One-row driver-side read by design —
    the same O(1)-result class as the JDBC-bounds and query-vector
    lookups."""
    sql = _prep_stmt_sql(state, f"SELECT CAST(({expr}) AS {cast}) AS v")
    row = spark.sql(translate_redshift_sql(sql)).first()
    return None if row is None else row[0]


def _run_merge_into(
    spark: SparkSession, state: "_ScriptState", tgt_name: str, tgt_alias: str, rest: str
) -> None:
    """Execute a parsed ``MERGE INTO`` through the relational merge plan
    (operators/merge.py merge_upsert: ONE full-outer join on the merge
    key + conditional projection — the physical plan every engine's
    MERGE lowers to, one key-partitioned shuffle at any scale).

    Redshift semantics honored loudly:
    - exactly the documented clause forms (WHEN MATCHED THEN UPDATE SET
      / THEN DELETE, WHEN NOT MATCHED THEN INSERT); extra AND
      predicates on WHEN clauses are not Redshift MERGE and raise;
    - the ON condition must be AND-ed equality pairs between the two
      tables (Redshift requires the merge key; range conditions raise);
    - a source row matching multiple times raises "found multiple
      matches" AT RUNTIME via a distributed raise_error guard (a window
      count over the source keys — the delta side, which the join
      shuffles by key anyway), exactly Redshift's contract;
    - INSERT must supply each merge-key column as the source's key
      reference (anything else would create a row that contradicts its
      own match condition — Redshift rejects this shape too);
      non-listed insert columns become NULL.
    """
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    from sql_redshift_etl_spark.operators.merge import merge_upsert

    src_spec, after_on = _split_top_kw(rest, "ON")
    if after_on is None:
        raise ValueError(f"MERGE INTO {tgt_name}: missing ON condition")
    sm = re.match(r"(?is)^([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s*$", src_spec)
    if not sm:
        raise ValueError(
            f"MERGE INTO {tgt_name}: USING must name a table (optionally "
            f"aliased), got {src_spec[:60]!r} — stage subqueries as a temp "
            "table first (Redshift's own MERGE takes a table reference)"
        )
    src_name, src_alias = sm.group(1), sm.group(2) or sm.group(1)
    cond, when_text = _split_top_kw(after_on, "WHEN")
    remove_duplicates = False
    if when_text is None:
        # Redshift's SIMPLIFIED MERGE: `MERGE INTO t USING s ON cond
        # REMOVE DUPLICATES` — no WHEN clauses; matched target rows are
        # REPLACED by the source row (all columns), unmatched source
        # rows insert, and duplicate target/source rows on the merge key
        # collapse to one (Redshift's documented semantics for this
        # form; it requires the column lists to be identical).
        cond, tail = _split_top_kw(cond, "REMOVE")
        if tail is None or not re.match(r"(?is)^DUPLICATES\s*$", tail):
            raise ValueError(f"MERGE INTO {tgt_name}: no WHEN clauses")
        remove_duplicates = True

    target = state.existing(tgt_name)
    source = state.existing(src_name)
    tgt_by_lower = {c.lower(): c for c in target.columns}
    src_by_lower = {c.lower(): c for c in source.columns}

    # --- ON: AND-ed equality pairs → (target col, source col) keys ----
    keys: list[tuple[str, str]] = []
    for part in _split_top_and(cond):
        pm = re.match(r"(?is)^\(?\s*([\w.]+)\s*=\s*([\w.]+)\s*\)?\s*$", part)
        sides: dict[str, str] = {}
        for side in (pm.group(1), pm.group(2)) if pm else ():
            alias, _, col = side.rpartition(".")
            sides[alias.lower()] = col
        if not pm or set(sides) != {tgt_alias.lower(), src_alias.lower()}:
            raise ValueError(
                f"MERGE INTO {tgt_name}: ON must be AND-ed equalities between "
                f"{tgt_alias}.<col> and {src_alias}.<col>, got {part.strip()!r}"
            )
        tcol = tgt_by_lower.get(sides[tgt_alias.lower()].lower())
        scol = src_by_lower.get(sides[src_alias.lower()].lower())
        if tcol is None or scol is None:
            raise ValueError(f"MERGE INTO {tgt_name}: unknown key column in {part.strip()!r}")
        keys.append((tcol, scol))

    # Source key columns renamed to the target's names (merge_upsert
    # joins same-named keys); expression text is rewritten to match.
    key_rename = {s.lower(): t for t, s in keys if s.lower() != t.lower()}
    src = source
    for t_, s_ in keys:
        if s_.lower() != t_.lower():
            src = src.withColumnRenamed(src_by_lower[s_.lower()], t_)
    key_cols = [t for t, _ in keys]

    if remove_duplicates:
        tgt_set = {c.lower() for c in target.columns}
        src_set = {c.lower() for c in src.columns}
        if tgt_set != src_set:
            raise ValueError(
                f"MERGE INTO {tgt_name} ... REMOVE DUPLICATES requires identical "
                f"column lists (target {sorted(tgt_set)}, source {sorted(src_set)})"
            )
        # one replacement row per matched/new key (deterministic pick by
        # full-row order — Redshift leaves the winner unspecified);
        # matched target rows, duplicates included, are all replaced
        one = (
            src.withColumn(
                "__rn",
                F.row_number().over(
                    _W.partitionBy(*key_cols).orderBy(*sorted(src.columns))
                ),
            )
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        by_lower = {c.lower(): c for c in one.columns}
        repl = one.select(
            *[
                F.col(by_lower[f.name.lower()]).cast(f.dataType).alias(f.name)
                for f in target.schema.fields
            ]
        )
        survivors = target.join(one.select(*key_cols), on=key_cols, how="left_anti")
        state.bind(tgt_name, survivors.unionByName(repl))
        return

    def rewrite(expr_text: str) -> str:
        def sub(mm: "re.Match[str]") -> str:
            alias, col = mm.group(1).lower(), mm.group(2)
            if alias == tgt_alias.lower():
                return f"t.{col}"
            return f"s.{key_rename.get(col.lower(), col)}"

        pat = rf"(?i)\b({re.escape(tgt_alias)}|{re.escape(src_alias)})\.(\w+)"
        return _sub_outside_quotes(expr_text, pat, sub)

    # --- WHEN clauses --------------------------------------------------
    clauses: list[str] = []
    cur: str | None = when_text
    while cur is not None:
        head, cur = _split_top_kw(cur, "WHEN")
        clauses.append(head)
    update_set: dict = {}
    insert_cols: list[str] | None = None
    insert_exprs: list[str] | None = None
    delete_matched = False
    saw_matched = saw_not_matched = False
    for cl in clauses:
        if re.match(r"(?is)^(?:NOT\s+)?MATCHED\s+AND\b", cl):
            raise ValueError(
                f"MERGE INTO {tgt_name}: WHEN ... AND predicates are not part "
                "of Redshift MERGE (its WHEN clauses are unconditional)"
            )
        if um := re.match(r"(?is)^MATCHED\s+THEN\s+UPDATE\s+SET\s+(.+)$", cl):
            saw_matched = True
            for c, e in _split_assignments(um.group(1)):
                c = c.rpartition(".")[2]  # tolerate tgt-qualified SET t.c = ...
                f = next((f for f in target.schema.fields if f.name.lower() == c.lower()), None)
                if f is None:
                    raise ValueError(f"MERGE INTO {tgt_name}: unknown SET column {c!r}")
                if f.name in key_cols:
                    raise ValueError(
                        f"MERGE INTO {tgt_name}: cannot UPDATE merge key {f.name!r}"
                    )
                update_set[f.name] = F.expr(rewrite(e)).cast(f.dataType)
        elif re.match(r"(?is)^MATCHED\s+THEN\s+DELETE\s*$", cl):
            saw_matched = delete_matched = True
        elif im := re.match(
            r"(?is)^NOT\s+MATCHED\s+THEN\s+INSERT\s*(?:\(([^)]*)\)\s*)?VALUES\s*\((.+)\)\s*$",
            cl,
        ):
            saw_not_matched = True
            insert_exprs = [e.strip() for e in _split_top_commas(im.group(2))]
            insert_cols = (
                [c.strip() for c in im.group(1).split(",")]
                if im.group(1)
                else list(target.columns)
            )
            if len(insert_cols) != len(insert_exprs):
                raise ValueError(
                    f"MERGE INTO {tgt_name}: INSERT lists {len(insert_cols)} "
                    f"columns but {len(insert_exprs)} values"
                )
        else:
            raise ValueError(f"MERGE INTO {tgt_name}: unsupported WHEN clause {cl[:60]!r}")
    if delete_matched and update_set:
        raise ValueError(
            f"MERGE INTO {tgt_name}: WHEN MATCHED is either UPDATE or DELETE, not both"
        )
    if not (saw_matched and saw_not_matched):
        raise ValueError(
            f"MERGE INTO {tgt_name}: Redshift MERGE requires both a WHEN MATCHED "
            "and a WHEN NOT MATCHED clause"
        )

    insert_values: dict = {}
    listed_by_lower = {}
    if insert_cols is not None and insert_exprs is not None:
        for c, e in zip(insert_cols, insert_exprs):
            cc = tgt_by_lower.get(c.lower())
            if cc is None:
                raise ValueError(f"MERGE INTO {tgt_name}: unknown INSERT column {c!r}")
            listed_by_lower[cc.lower()] = e
        for f in target.schema.fields:
            e = listed_by_lower.get(f.name.lower())
            if f.name in key_cols:
                # the key's insert value MUST be the source key reference
                want = f"s.{f.name}"
                got = rewrite(e).strip() if e is not None else None
                if got is None or got.lower() != want.lower():
                    raise ValueError(
                        f"MERGE INTO {tgt_name}: INSERT must set merge key "
                        f"{f.name!r} to the source key (got {e!r})"
                    )
                continue
            if e is None:
                insert_values[f.name] = F.lit(None).cast(f.dataType)
            else:
                insert_values[f.name] = F.expr(rewrite(e)).cast(f.dataType)

    # --- "found multiple matches" runtime guard ------------------------
    # Distributed, lazy, and on the delta side only: count per key via a
    # window, raise inside the plan when any key repeats. The cast gives
    # raise_error's NULL type the key's type so the CASE branches agree.
    k0 = key_cols[0]
    k0_type = next(f.dataType for f in src.schema.fields if f.name == k0)
    cnt = F.count(F.lit(1)).over(_W.partitionBy(*key_cols))
    src = src.withColumn(
        k0,
        F.when(
            cnt > 1,
            F.raise_error(
                F.lit(f"MERGE INTO {tgt_name}: found multiple source matches for a key")
            ).cast(k0_type),
        ).otherwise(F.col(k0)),
    )

    merged = merge_upsert(
        target,
        src,
        key_cols,
        update_set=update_set,
        insert_values=insert_values,
        delete_when=F.lit(True) if delete_matched else None,
    )
    state.bind(tgt_name, merged)


def run_redshift_script(spark: SparkSession, script: str) -> DataFrame | None:
    """Execute a multi-statement Redshift-dialect script; returns the
    last SELECT's DataFrame (None if the script has no query statement).
    Base tables must be registered as views (catalog.register_views or
    ``createOrReplaceTempView``); script-created temp tables shadow them
    for the script's duration and are dropped afterward."""
    from pyspark.sql import functions as F

    from collections import deque

    state = _ScriptState(spark)
    result: DataFrame | None = None
    try:
        # worklist, not a plain loop: CALL expands a procedure body into
        # statements executed in place (front of the queue)
        pending = deque(split_statements(script))
        n_calls = 0
        # Active EXCEPTION guards (innermost last): each entry holds the
        # block-entry state snapshot, the handler text, the defining
        # scope, and the block's end marker on the worklist.
        guard_stack: list[dict] = []
        n_execs = 0
        while pending:
            try:
                raw = pending.popleft()
                # plpgsql control nodes (from CALL-expanded bodies) expand in
                # place: the taken branch / next iteration's statements go to
                # the FRONT of the worklist, exactly where the block sat. A
                # _Scoped wrapper carries the CALL's variable scope; values
                # substitute when each statement RUNS (assignments between
                # statements change what later ones see).
                scope: dict | None = None
                if isinstance(raw, _Scoped):
                    scope, raw = raw.scope, raw.item

                def _in_scope(nodes: list) -> list:
                    return [_Scoped(nd, scope) for nd in nodes] if scope else nodes

                def _scoped_sql(sql: str) -> str:
                    return _subst_vars(scope, sql) if scope else sql

                if isinstance(raw, _IfNode):
                    for cond, body in raw.branches:
                        # NULL condition = branch not taken (SQL three-valued)
                        if bool(
                            _eval_script_scalar(spark, state, _scoped_sql(cond), "BOOLEAN")
                        ):
                            pending.extendleft(reversed(_in_scope(_parse_plpgsql_nodes(body))))
                            break
                    else:
                        if raw.else_body is not None:
                            pending.extendleft(
                                reversed(_in_scope(_parse_plpgsql_nodes(raw.else_body)))
                            )
                    continue
                if isinstance(raw, _WhileNode):
                    raw.iters += 1
                    if raw.iters > _WhileNode.MAX_ITERS:
                        raise ValueError(
                            f"WHILE: more than {_WhileNode.MAX_ITERS} iterations "
                            "in one script (runaway loop?)"
                        )
                    if raw.cond.strip().upper() == "TRUE" or bool(
                        _eval_script_scalar(spark, state, _scoped_sql(raw.cond), "BOOLEAN")
                    ):  # literal-TRUE (bare LOOP) skips the per-iteration job
                        # re-test after this iteration
                        pending.appendleft(_Scoped(raw, scope) if scope else raw)
                        pending.extendleft(
                            reversed(_in_scope(_parse_plpgsql_nodes(raw.body)))
                        )
                    continue
                if isinstance(raw, _ForNode):
                    if raw.vals is None:  # bounds evaluate once, at loop entry
                        frm = _eval_script_scalar(spark, state, _scoped_sql(raw.frm), "BIGINT")
                        to = _eval_script_scalar(spark, state, _scoped_sql(raw.to), "BIGINT")
                        if frm is None or to is None:
                            raise ValueError(f"FOR {raw.var}: NULL range bound")
                        step = 1
                        if raw.by is not None:
                            step = _eval_script_scalar(
                                spark, state, _scoped_sql(raw.by), "BIGINT"
                            )
                            if step is None or step <= 0:
                                # plpgsql's own rule: BY must be positive
                                raise ValueError(
                                    f"FOR {raw.var}: BY step must be a positive "
                                    f"integer, got {step!r}"
                                )
                        raw.vals = (
                            range(frm, to - 1, -step)
                            if raw.reverse
                            else range(frm, to + 1, step)
                        )
                        if len(raw.vals) > _ForNode.MAX_RANGE:
                            raise ValueError(
                                f"FOR {raw.var}: range of {len(raw.vals)} exceeds the "
                                f"{_ForNode.MAX_RANGE}-iteration cap"
                            )
                    if raw.idx < len(raw.vals):
                        # one iteration per pop; the re-pushed node is the
                        # loop marker EXIT/CONTINUE unwind to
                        v = raw.vals[raw.idx]
                        raw.idx += 1
                        pending.appendleft(_Scoped(raw, scope) if scope else raw)
                        pending.extendleft(
                            reversed(
                                _in_scope(
                                    _parse_plpgsql_nodes(
                                        _sub_loop_var(raw.body, raw.var, str(v))
                                    )
                                )
                            )
                        )
                    continue
                if isinstance(raw, _ForQueryNode):
                    if raw.rows is None:  # the query evaluates once, at loop entry
                        qdf = spark.sql(
                            translate_redshift_sql(
                                _prep_stmt_sql(state, _scoped_sql(raw.query))
                            ).strip()
                        )
                        raw.fields = [
                            (f.name, f.dataType.simpleString()) for f in qdf.schema.fields
                        ]
                        raw.rows = qdf.take(_ForQueryNode.MAX_ROWS + 1)
                        if len(raw.rows) > _ForQueryNode.MAX_ROWS:
                            raise ValueError(
                                f"FOR {raw.var} IN <query>: more than "
                                f"{_ForQueryNode.MAX_ROWS} rows — a control-table "
                                "loop, not a per-fact loop (use a join)"
                            )
                    if raw.idx >= len(raw.rows):
                        # loop exit: plpgsql sets FOUND = "did the loop
                        # iterate at all" when a query-FOR finishes (r12)
                        if scope is not None and "found" in scope:
                            scope["found"][1] = len(raw.rows) > 0
                        continue
                    if raw.idx < len(raw.rows):
                        row = raw.rows[raw.idx]
                        raw.idx += 1
                        body = raw.body
                        for (fname, ftyp), val in zip(raw.fields, row):
                            lit = _sql_literal(val, ftyp)
                            # shadow-aware: a nested FOR rebinding the
                            # record name owns var.field inside its body
                            body = _sub_skip_shadowed(
                                body,
                                raw.var,
                                rf"(?i)(?<![\w$]){re.escape(raw.var)}\s*\.\s*"
                                rf"{re.escape(fname)}(?![\w$])",
                                lambda _m, _lit=lit: _lit,
                            )
                        pending.appendleft(_Scoped(raw, scope) if scope else raw)
                        pending.extendleft(
                            reversed(_in_scope(_parse_plpgsql_nodes(body)))
                        )
                    continue
                if isinstance(raw, _CallEnd):
                    # normal fall-through off the end of a CALL; an
                    # INOUT-bearing CALL writes caller variables back and,
                    # when top-level, returns its final values as a row
                    if raw.inout:
                        res = _inout_result(spark, raw)
                        if res is not None:
                            result = res
                    continue
                if isinstance(raw, _DeclBlockNode):
                    # r9: enter the DECLARE sub-block — shadow-save every
                    # declared name, evaluate defaults in order (each sees
                    # earlier inner vars; a shadowing default still sees
                    # the outer value), then run the BEGIN block under the
                    # (possibly fresh) scope with a restore marker after.
                    # The marker enqueues BEFORE default evaluation and its
                    # saved-dict fills incrementally: a default that raises
                    # mid-section leaves the marker live, so an OUTER
                    # guard's unwind un-shadows exactly the already-applied
                    # names instead of leaking them (r9 review).
                    eff = scope if scope is not None else {}
                    saved: dict = {}
                    end = _DeclEnd(saved, eff)
                    pending.appendleft(_Scoped(end, eff))
                    for vname, vtyp, vdefault in raw.decls:
                        saved[vname] = eff.get(vname, _DECL_MISSING)
                        value = (
                            None
                            if vdefault is None
                            else _eval_script_scalar(
                                spark, state, _subst_vars(eff, vdefault), vtyp
                            )
                        )
                        eff[vname] = [vtyp, value]
                    pending.appendleft(_Scoped(raw.block, eff))
                    continue
                if isinstance(raw, _DeclEnd):
                    raw.restore()
                    continue
                if isinstance(raw, _GuardNode):
                    if raw.handler is None:
                        # plain nested BEGIN/END: statement grouping only
                        pending.extendleft(
                            reversed(_in_scope(_parse_plpgsql_nodes(raw.body)))
                        )
                        continue
                    end = _GuardEnd()
                    guard_stack.append(
                        {
                            "snap": state.snapshot(),
                            "handler": raw.handler,
                            "scope": scope,
                            "end": end,
                            # cursors already open at guard entry survive a
                            # catch; ones OPENed (or CLOSEd-and-reOPENed)
                            # inside the block close on rollback (plpgsql
                            # closes portals opened inside an aborted
                            # block — their buffered rows came from undone
                            # state). Keyed on the BUFFER OBJECT, not the
                            # name, so a re-OPEN behind the same name is
                            # still detected.
                            "open_cursors": {
                                n: e[1].rows
                                for n, e in (scope or {}).items()
                                if e[0] == "CURSOR" and e[1].rows is not None
                            },
                        }
                    )
                    state.guard_depth = len(guard_stack)
                    pending.appendleft(end)
                    pending.extendleft(
                        reversed(_in_scope(_parse_plpgsql_nodes(raw.body)))
                    )
                    continue
                if isinstance(raw, _GuardEnd):
                    # clean completion: discard the innermost snapshot
                    g = guard_stack.pop()
                    if g["end"] is not raw:  # pragma: no cover - invariant
                        raise AssertionError("EXCEPTION guard stack out of sync")
                    state.guard_depth = len(guard_stack)
                    continue
                if isinstance(raw, str) and re.match(r"(?i)^(EXIT|CONTINUE)\b", raw):
                    um = re.match(r"(?is)^(EXIT|CONTINUE)\b(?:\s+WHEN\s+(.+))?\s*$", raw)
                    if um is None:
                        raise ValueError(
                            f"EXIT/CONTINUE: labels unsupported ({raw[:40]!r})"
                        )
                    kw, when = um.group(1).upper(), um.group(2)
                    if when is not None and not bool(
                        _eval_script_scalar(spark, state, _scoped_sql(when), "BOOLEAN")
                    ):
                        continue
                    # unwind queued items to the innermost loop marker (the
                    # re-pushed _WhileNode/_ForNode); EXIT consumes it,
                    # CONTINUE leaves it so the next iteration runs. A
                    # _CallEnd fence means no enclosing loop — loud.
                    while pending:
                        nxt = pending[0]
                        inner = nxt.item if isinstance(nxt, _Scoped) else nxt
                        if isinstance(inner, (_WhileNode, _ForNode, _ForQueryNode)):
                            if kw == "EXIT":
                                pending.popleft()
                                # plpgsql sets FOUND = "iterated at least
                                # once" on ANY query-FOR exit, EXIT
                                # included (exec_for_query stamps it after
                                # the loop regardless of how it ended) —
                                # ADVICE r12. Integer-FOR and WHILE never
                                # touch FOUND, per plpgsql.
                                if isinstance(inner, _ForQueryNode):
                                    fscope = (
                                        nxt.scope
                                        if isinstance(nxt, _Scoped)
                                        else scope
                                    )
                                    if fscope is not None and "found" in fscope:
                                        fscope["found"][1] = inner.idx > 0
                            break
                        if isinstance(inner, _CallEnd):
                            raise ValueError(f"{kw}: no enclosing loop")
                        if isinstance(inner, _GuardEnd):
                            # exiting a guarded block early retires its
                            # guard (clean exit — snapshot discarded)
                            guard_stack.pop()
                            state.guard_depth = len(guard_stack)
                        if isinstance(inner, _DeclEnd):
                            # leaving a DECLARE sub-block early still
                            # un-shadows its variables
                            inner.restore()
                        pending.popleft()
                    else:
                        raise ValueError(f"{kw}: no enclosing loop")
                    continue
                if isinstance(raw, str) and re.match(r"(?i)^RETURN\b", raw):
                    if re.sub(r"(?i)^RETURN", "", raw).strip(" ;"):
                        raise ValueError(
                            "RETURN with a value: procedures return nothing — "
                            "write results to a table the caller reads"
                        )
                    # early exit from the current procedure: unwind to (and
                    # through) the CALL fence; loop markers on the way die
                    while pending:
                        nxt = pending.popleft()
                        inner = nxt.item if isinstance(nxt, _Scoped) else nxt
                        if isinstance(inner, _GuardEnd):
                            # RETURN out of a guarded block: clean exit,
                            # snapshot discarded
                            guard_stack.pop()
                            state.guard_depth = len(guard_stack)
                        if isinstance(inner, _DeclEnd):
                            inner.restore()
                        if isinstance(inner, _CallEnd):
                            if inner.inout:  # early RETURN still reports
                                res = _inout_result(spark, inner)
                                if res is not None:
                                    result = res
                            break
                    else:
                        raise ValueError("RETURN: not inside a procedure CALL")
                    continue
                if isinstance(raw, str) and re.match(r"(?i)^EXECUTE\b", raw):
                    # plpgsql EXECUTE: evaluate the command-string
                    # expression (variables substitute as literals, the
                    # QUOTE_IDENT/QUOTE_LITERAL scalars from misc3 do the
                    # quoting), then run the resulting text as ONE
                    # statement. Dynamic SQL does NOT see plpgsql
                    # variables — plpgsql's own contract — so the built
                    # statement enqueues unscoped. `EXECUTE ... INTO
                    # var[, ...]` assigns the single result row instead;
                    # `USING expr, ...` (r8) value-binds $N placeholders
                    # below.
                    n_execs += 1
                    if n_execs > 1000:
                        raise ValueError(
                            "EXECUTE: more than 1000 dynamic statements in "
                            "one script (runaway loop?)"
                        )
                    body_txt = raw[7:].strip()
                    # USING is the last clause (plpgsql: EXECUTE cmd
                    # [INTO t,...] [USING e,...]); split it off before INTO
                    head_txt, using_tail = _split_top_kw(body_txt, "USING")
                    expr, into_tail = _split_top_kw(head_txt, "INTO")
                    if not expr:
                        raise ValueError("EXECUTE: empty command-string expression")
                    sql_text = _eval_script_scalar(
                        spark, state, _scoped_sql(expr), "STRING"
                    )
                    if sql_text is None or not str(sql_text).strip():
                        raise ValueError("EXECUTE: command string is NULL/empty")
                    sql_text = str(sql_text).strip().rstrip(";").strip()
                    if using_tail is not None:
                        # EXECUTE ... USING (r8): $N placeholders bind the
                        # N-th USING expression's VALUE (evaluated now, in
                        # the current scope — one bounded one-row job per
                        # argument) as a typed literal, outside quotes only
                        # — plpgsql's value-not-text parameter contract.
                        from sql_redshift_etl_spark.functions.redshift_sql import (
                            _split_args,
                        )

                        rendered: list[str] = []
                        for a in _split_args(using_tail):
                            if not a.strip():
                                raise ValueError("EXECUTE ... USING: empty argument")
                            vdf = spark.sql(
                                translate_redshift_sql(
                                    _prep_stmt_sql(
                                        state,
                                        f"SELECT ({_scoped_sql(a)}) AS v",
                                    )
                                ).strip()
                            )
                            vrow = vdf.first()
                            rendered.append(
                                _sql_literal(
                                    None if vrow is None else vrow[0],
                                    vdf.schema.fields[0].dataType.simpleString(),
                                )
                            )
                        used = {
                            int(m.group(1))
                            for m in re.finditer(r"\$(\d+)", _mask_quoted(sql_text))
                        }
                        if used and max(used) > len(rendered):
                            raise ValueError(
                                f"EXECUTE ... USING: ${max(used)} referenced but "
                                f"only {len(rendered)} argument(s) supplied"
                            )
                        if used and min(used) < 1:
                            # $0 would pass the max() check yet never be
                            # substituted (binds are 1-based) — reject with
                            # the same arity message, not an opaque parser
                            # error downstream
                            raise ValueError(
                                "EXECUTE ... USING: $0 referenced but "
                                "placeholders are numbered from $1"
                            )
                        for i in sorted(range(1, len(rendered) + 1), reverse=True):
                            sql_text = _sub_outside_quotes(
                                sql_text,
                                rf"\${i}(?!\d)",
                                lambda _m, _lit=rendered[i - 1]: _lit,
                            )
                    if into_tail is None:
                        pending.appendleft(sql_text)
                        continue
                    names = [n.strip().lower() for n in into_tail.split(",")]
                    if scope is None or not all(n and n in scope for n in names):
                        raise ValueError(
                            f"EXECUTE ... INTO: target(s) {into_tail.strip()!r} "
                            "must all be declared plpgsql variables"
                        )
                    row = spark.sql(
                        translate_redshift_sql(_prep_stmt_sql(state, sql_text)).strip()
                    ).first()
                    vals = list(row) if row is not None else [None] * len(names)
                    if len(vals) != len(names):
                        raise ValueError(
                            f"EXECUTE ... INTO: {len(names)} variable(s) but "
                            f"query returns {len(vals)} column(s)"
                        )
                    for n, v in zip(names, vals):
                        scope[n][1] = v
                    state.last_dml = 1 if row is not None else 0
                    continue
                if isinstance(raw, str) and re.match(r"(?i)^PERFORM\b", raw):
                    # plpgsql PERFORM (r8): run the query, discard the
                    # rows. FOUND reflects whether it produced any row
                    # (one bounded limit-1 job); ROW_COUNT is tracked as
                    # the usual LAZY plan — the discarded row count is
                    # computed only if GET DIAGNOSTICS actually reads it.
                    tail = raw[7:].strip()
                    if not tail:
                        raise ValueError("PERFORM: empty query")
                    qdf = spark.sql(
                        translate_redshift_sql(
                            _prep_stmt_sql(state, _scoped_sql(f"SELECT {tail}"))
                        ).strip()
                    )
                    hit = qdf.first() is not None
                    if scope is not None and "found" in scope:
                        scope["found"][1] = hit
                    state.last_dml = qdf
                    continue
                if scope is not None:
                    if raw[:3].upper() == "GET":
                        # GET DIAGNOSTICS var := ROW_COUNT (r7): rows
                        # affected by the last tracked statement —
                        # INSERT/UPDATE/DELETE/TRUNCATE (lazy affected-set
                        # plans counted on first read, then cached) plus
                        # the 0/1 of SELECT INTO var, FETCH, and
                        # EXECUTE ... INTO. Any other preceding statement
                        # resets the count to untracked — reading it then
                        # is loud, never silently stale.
                        gm = re.match(
                            r"(?is)^GET\s+DIAGNOSTICS\s+([\w$]+)\s*(?::=|=)\s*ROW_COUNT\s*$",
                            raw,
                        )
                        if gm is None:
                            raise ValueError(
                                f"GET DIAGNOSTICS: only 'var := ROW_COUNT' is "
                                f"supported, got {raw[:60]!r}"
                            )
                        vname = gm.group(1).lower()
                        if vname not in scope or scope[vname][0] == "CURSOR":
                            raise ValueError(
                                f"GET DIAGNOSTICS: {vname!r} is not a declared "
                                "scalar variable"
                            )
                        if state.last_dml is None:
                            raise ValueError(
                                "GET DIAGNOSTICS ROW_COUNT: the preceding "
                                "statement's row count is not tracked (tracked: "
                                "INSERT/UPDATE/DELETE/TRUNCATE, SELECT INTO var, "
                                "FETCH, EXECUTE INTO)"
                            )
                        if not isinstance(state.last_dml, int):
                            state.last_dml = state.last_dml.count()
                        scope[vname][1] = state.last_dml
                        continue
                    # forward-only cursor ops (r7): OPEN evaluates the
                    # bound query NOW through the dialect front-end with
                    # current variable values, buffering at most
                    # MAX_ROWS control rows driver-side (the same
                    # bounded O(small)-result contract as FOR-over-query
                    # — plpgsql row loops run on the coordinator by the
                    # language's own semantics); FETCH assigns the next
                    # row (NULLs + found=FALSE past the end, plpgsql's
                    # SELECT INTO contract); CLOSE releases the buffer.
                    if om := re.match(r"(?is)^OPEN\s+([\w$]+)\s*$", raw):
                        cname = om.group(1).lower()
                        ent = scope.get(cname)
                        if ent is None or ent[0] != "CURSOR":
                            raise ValueError(f"OPEN: {cname!r} is not a declared cursor")
                        cur = ent[1]
                        if cur.rows is not None:
                            raise ValueError(f"OPEN {cname}: cursor is already open")
                        qdf = spark.sql(
                            translate_redshift_sql(
                                _prep_stmt_sql(state, _scoped_sql(cur.query))
                            ).strip()
                        )
                        cur.fields = [
                            (f.name, f.dataType.simpleString())
                            for f in qdf.schema.fields
                        ]
                        cur.rows = qdf.take(_Cursor.MAX_ROWS + 1)
                        if len(cur.rows) > _Cursor.MAX_ROWS:
                            raise ValueError(
                                f"OPEN {cname}: more than {_Cursor.MAX_ROWS} rows "
                                "— a control-table cursor, not a per-fact one "
                                "(use a join)"
                            )
                        cur.idx = 0
                        continue
                    if fm := re.match(
                        r"(?is)^FETCH\s+(?:NEXT\s+)?(?:FROM\s+)?([\w$]+)\s+INTO\s+(.+)$",
                        raw,
                    ):
                        cname = fm.group(1).lower()
                        ent = scope.get(cname)
                        if ent is None or ent[0] != "CURSOR":
                            raise ValueError(f"FETCH: {cname!r} is not a declared cursor")
                        cur = ent[1]
                        if cur.rows is None:
                            raise ValueError(f"FETCH {cname}: cursor is not open")
                        names = [n.strip().lower() for n in fm.group(2).split(",")]
                        bad = [
                            n
                            for n in names
                            if n not in scope or scope[n][0] == "CURSOR"
                        ]
                        if bad:
                            raise ValueError(
                                f"FETCH ... INTO: {', '.join(bad)} not declared "
                                "scalar variable(s)"
                            )
                        if cur.idx < len(cur.rows):
                            vals = list(cur.rows[cur.idx])
                            cur.idx += 1
                            hit = True
                        else:
                            vals = [None] * len(names)
                            hit = False
                        if hit and len(vals) != len(names):
                            raise ValueError(
                                f"FETCH {cname}: {len(names)} variable(s) but "
                                f"cursor returns {len(vals)} column(s)"
                            )
                        for n, v in zip(names, vals):
                            scope[n][1] = v
                        if "found" in scope:
                            scope["found"][1] = hit
                        state.last_dml = 1 if hit else 0
                        continue
                    if cm := re.match(r"(?is)^CLOSE\s+([\w$]+)\s*$", raw):
                        cname = cm.group(1).lower()
                        ent = scope.get(cname)
                        if ent is None or ent[0] != "CURSOR":
                            raise ValueError(f"CLOSE: {cname!r} is not a declared cursor")
                        if ent[1].rows is None:
                            raise ValueError(f"CLOSE {cname}: cursor is not open")
                        ent[1].rows = None
                        continue
                    # `var := expr;` — plpgsql assignment into the scope
                    if am := _ASSIGN.match(raw):
                        vname = am.group(1).lower()
                        if vname not in scope:
                            raise ValueError(f"assignment to undeclared variable {vname!r}")
                        scope[vname][1] = _eval_script_scalar(
                            spark, state, _scoped_sql(am.group(2)), scope[vname][0]
                        )
                        continue
                    # `SELECT ... INTO [STRICT] var[, var2] FROM ...` —
                    # variable form (an INTO list that is NOT all declared
                    # variables falls through to the table-CTAS SELECT INTO
                    # below — except under STRICT, which only exists in the
                    # variable form, so an undeclared name there is loud)
                    if raw[:6].upper() == "SELECT":
                        head, tail = _split_top_kw(raw, "INTO")
                        if tail is not None:
                            tail_s = tail.strip()
                            stricted = re.match(r"(?is)^STRICT\b(.*)$", tail_s)
                            if stricted:
                                tail_s = stricted.group(1).strip()
                            nm = re.match(
                                r"(?s)^((?:[\w$]+\s*,\s*)*[\w$]+)\s*(.*)$", tail_s
                            )
                            names = (
                                [n.strip().lower() for n in nm.group(1).split(",")]
                                if nm
                                else []
                            )
                            if stricted and not (
                                names and all(n in scope for n in names)
                            ):
                                raise ValueError(
                                    "SELECT INTO STRICT: every INTO name must "
                                    f"be a declared variable; got {names!r}"
                                )
                            if names and all(n in scope for n in names):
                                query = f"{head} {nm.group(2)}".strip()
                                qdf2 = spark.sql(
                                    translate_redshift_sql(
                                        _prep_stmt_sql(state, _scoped_sql(query))
                                    ).strip()
                                )
                                if stricted:
                                    # plpgsql STRICT: exactly one row or a
                                    # CATCHABLE error (RuntimeError — the
                                    # guard routes it; ValueError stays
                                    # loud by module policy). Bounded
                                    # take(2) job, never a full count.
                                    got2 = qdf2.take(2)
                                    if not got2:
                                        raise RuntimeError(
                                            "SELECT INTO STRICT: query "
                                            "returned no rows (no_data_found)"
                                        )
                                    if len(got2) > 1:
                                        raise RuntimeError(
                                            "SELECT INTO STRICT: query "
                                            "returned more than one row "
                                            "(too_many_rows)"
                                        )
                                    row = got2[0]
                                else:
                                    row = qdf2.first()
                                vals2 = list(row) if row is not None else [None] * len(names)
                                if len(vals2) != len(names):
                                    raise ValueError(
                                        f"SELECT INTO: {len(names)} variable(s) but "
                                        f"query returns {len(vals2)} column(s)"
                                    )
                                for n, v in zip(names, vals2):
                                    scope[n][1] = v
                                state.last_dml = 1 if row is not None else 0
                                # plpgsql: SELECT INTO sets FOUND (r12) —
                                # unlike EXECUTE ... INTO, which never does
                                if "found" in scope:
                                    scope["found"][1] = row is not None
                                continue
                    # CALL keeps its raw argument text: the handler
                    # substitutes caller variables per-argument so an
                    # INOUT argument that IS a caller variable can be
                    # recognized for write-back (pre-substituting the
                    # whole statement would erase the name)
                    if not _CALL.match(raw):
                        raw = _subst_vars(scope, raw)
                # Redshift #temp names → plain identifiers BEFORE statement
                # classification (the CREATE/COPY/INSERT regexes match \w
                # identifiers; '#stg' would silently fall through to
                # spark.sql and fail to parse). The front-end repeats the
                # rewrite for standalone statements — it is idempotent.
                raw = rewrite_temp_names(raw).strip()
                if m := _CREATE_SCHEMA.match(raw):
                    state.schemas.add(m.group(1).lower())
                    continue
                if m := _DROP_SCHEMA.match(raw):
                    s, mode = m.group(1).lower(), (m.group(2) or "RESTRICT").upper()
                    if s in state.schemas:
                        members = [
                            n for n in state.tables if n.lower().startswith(f"{s}__")
                        ]
                        if members and mode != "CASCADE":
                            raise ValueError(
                                f"DROP SCHEMA {s}: schema is not empty "
                                f"({', '.join(sorted(members))}) — use CASCADE"
                            )
                        for n in members:
                            spark.catalog.dropTempView(n)
                            state.tables.pop(n, None)
                            state.created_views.discard(n)
                            state.drop_meta(n)
                            state.mv_defs.pop(n, None)
                        state.schemas.discard(s)
                    elif "IF EXISTS" not in raw.upper():
                        raise ValueError(f"DROP SCHEMA: no schema {s!r}")
                    continue
                for s in state.schemas:
                    # flatten declared-schema-qualified names to one part
                    raw = _sub_outside_quotes(
                        raw, rf"(?i)\b{re.escape(s)}\s*\.\s*(\w+)", rf"{s}__\1"
                    )
                if state.search_path:
                    raw = _apply_search_path(state, raw)
                if raw[:6].upper() == "CREATE" and re.search(r"(?i)\bON\s+COMMIT\b", raw):
                    # CREATE TEMP TABLE ... ON COMMIT PRESERVE|DELETE ROWS:
                    # both spellings behave as PRESERVE here (documented
                    # simplification — r6's explicit transactions snapshot
                    # BINDINGS; an end-of-txn truncation hook would add
                    # state for a spelling Redshift ETLs rarely rely on);
                    # temp tables die at script end either way.
                    raw = _sub_outside_quotes(
                        raw,
                        r"(?i)\s+ON\s+COMMIT\s+(?:PRESERVE\s+ROWS|DELETE\s+ROWS|DROP)",
                        " ",
                    )
                if _CREATE_EXT_FUNC.match(raw):
                    raise ValueError(
                        "CREATE EXTERNAL FUNCTION (Lambda UDF) calls an AWS "
                        "Lambda endpoint — unavailable in this environment; "
                        "port the logic to LANGUAGE plpythonu (same Python, "
                        "runs in-engine as an Arrow-batched pandas UDF)"
                    )
                if hm := _CREATE_FUNC_HEAD.match(raw):
                    sig_end = _scan_balanced_fwd(raw, hm.end())
                    if tm := _CREATE_FUNC_TAIL.match(raw[sig_end:]):
                        # SQL identifiers are case-insensitive (so is
                        # Spark's UDF registry) — one lowercase key per
                        # function, or DROP/REPLACE under another case
                        # would desync the dicts from the registry
                        fname = hm.group(1).lower()
                        lang = tm.group(3).lower()
                        if lang == "plpythonu":
                            sig = raw[hm.end() : sig_end - 1]
                            params = _parse_func_params(sig)
                            if not params or any(p.startswith("$") for p in params):
                                raise ValueError(
                                    f"CREATE FUNCTION {fname}: plpythonu "
                                    "parameters must be NAMED (the body "
                                    "references them by name) and at least "
                                    "one is required"
                                )
                            spec = (
                                params,
                                _parse_func_param_types(sig),
                                tm.group(1),
                                tm.group(2),
                            )
                            _register_python_udf(spark, fname, *spec)
                            # OR REPLACE across languages: one name, one fn
                            state.funcs.pop(fname, None)
                            state.py_funcs[fname] = spec
                            continue
                        if lang != "sql":
                            raise ValueError(
                                f"CREATE FUNCTION {fname}: LANGUAGE {tm.group(3)} "
                                "unsupported — scalar SQL UDFs inline, "
                                "plpythonu registers as an Arrow-batched "
                                "pandas UDF; nothing else exists in Redshift"
                            )
                        body = tm.group(2).strip().rstrip(";").strip()
                        body = re.sub(r"(?is)^SELECT\s+", "", body)
                        if state.py_funcs.pop(fname, None) is not None:
                            # replaced ACROSS languages: calls now inline,
                            # but tombstone the Spark registration so a
                            # later DROP + call can't resolve the stale
                            # Python body through the registry
                            _register_py_udf_tombstone(spark, fname)
                        state.funcs[fname] = (
                            _parse_func_params(raw[hm.end() : sig_end - 1]),
                            body,
                        )
                        continue
                if m := _DROP_FUNC.match(raw):
                    dname = m.group(1).lower()
                    if dname in state.py_funcs:
                        state.py_funcs.pop(dname)
                        _register_py_udf_tombstone(spark, dname)
                        continue
                    if dname in state.funcs or "IF EXISTS" in raw.upper():
                        state.funcs.pop(dname, None)
                        continue
                    raise ValueError(f"DROP FUNCTION: no SQL UDF {m.group(1)!r}")
                if state.funcs:
                    raw = _inline_sql_udfs(raw, state.funcs)
                # Stored procedures are matched on the RAW statement — the
                # dialect front-end must not rewrite a $$ body at define
                # time (each body statement is rewritten when it RUNS).
                if hm := _CREATE_PROC_HEAD.match(raw):
                    sig_end = _scan_balanced_fwd(raw, hm.end())
                    tm = _CREATE_PROC_TAIL.match(raw[sig_end:])
                    if tm is None:
                        raise ValueError(
                            f"CREATE PROCEDURE {hm.group(1)}: expected "
                            "AS $$ ... $$ LANGUAGE plpgsql"
                        )
                    params = _parse_proc_params(raw[hm.end() : sig_end - 1])
                    body = tm.group(1).strip()
                    bm = re.match(
                        r"(?is)^(?:DECLARE\b(.*?))?\s*BEGIN\b(.*?)\bEND\s*;?\s*$", body
                    )
                    if bm is None:
                        raise ValueError(
                            f"CREATE PROCEDURE {hm.group(1)}: body must be one "
                            "[DECLARE ...] BEGIN ... END block"
                        )
                    decls = _parse_proc_decls(bm.group(1) or "", hm.group(1))
                    body = bm.group(2)
                    if _toplevel_exception(_mask_quoted(body)):
                        # the common real-proc form puts the EXCEPTION
                        # section on the procedure's own outer block
                        # (stripped above) — re-wrap so the whole body
                        # parses as one guarded BEGIN...EXCEPTION...END
                        body = f"BEGIN {body} END"
                    _parse_plpgsql_nodes(body)  # surface block-structure errors at define time
                    state.procs[hm.group(1)] = (params, decls, body)
                    continue
                if m := _DROP_PROC.match(raw):
                    if m.group(1) not in state.procs and "IF EXISTS" not in raw.upper():
                        raise ValueError(f"DROP PROCEDURE: no procedure {m.group(1)!r}")
                    state.procs.pop(m.group(1), None)
                    continue
                if m := _CALL.match(raw):
                    name = m.group(1)
                    if name not in state.procs:
                        raise ValueError(f"CALL: no procedure {name!r} defined in this script")
                    n_calls += 1
                    if n_calls > 256:
                        # a self-CALLing procedure has no terminating
                        # condition in the straight-line subset — without a
                        # cap the worklist loops forever
                        raise ValueError(
                            "CALL: more than 256 procedure expansions in one "
                            "script (recursive CALL?)"
                        )
                    params, decls, body = state.procs[name]
                    args = [a.strip() for a in _split_top_commas(m.group(2)) if a.strip()]
                    if len(args) != len(params):
                        raise ValueError(
                            f"CALL {name}: expected {len(params)} argument(s) "
                            f"({', '.join(p[0] for p in params)}), got {len(args)}"
                        )
                    call_decls = decls
                    caller_scope = scope  # the _Scoped wrapper's scope (or None)
                    # a CALL expanded from inside another CALL still has
                    # that CALL's end-marker queued — nested per Redshift
                    nested_call = any(
                        isinstance(x.item if isinstance(x, _Scoped) else x, _CallEnd)
                        for x in pending
                    )
                    scope = {}
                    inout: list[tuple[str, str]] = []
                    writebacks: list[tuple[dict, str, str]] = []
                    for (pname, pmode, ptyp), a in zip(params, args):
                        if pmode == "INOUT":
                            # INOUT (r8): a scoped variable initialized
                            # from the CALL argument (evaluated NOW, in
                            # the CALLER's scope); the top-level CALL
                            # returns its final value, a nested CALL
                            # writes it back into the caller's variable
                            # (plpgsql's by-reference contract)
                            inout.append((pname.lower(), ptyp))
                            a_var = a.strip().lower()
                            if (
                                caller_scope is not None
                                and a_var in caller_scope
                                and caller_scope[a_var][0] != "CURSOR"
                            ):
                                init = caller_scope[a_var][1]
                                writebacks.append((caller_scope, a_var, pname.lower()))
                            elif caller_scope is not None:
                                # plpgsql: a writable argument in a
                                # procedure-context CALL must be a
                                # variable (the result has nowhere to go)
                                raise ValueError(
                                    f"CALL {name}: INOUT argument {pname!r} "
                                    f"must be a declared variable inside a "
                                    f"procedure, got expression {a[:40]!r}"
                                )
                            else:
                                init = _eval_script_scalar(spark, state, a, ptyp)
                            scope[pname.lower()] = [ptyp, init]
                            continue
                        # identifier-boundary textual substitution (plpgsql
                        # itself substitutes params lexically) — into the
                        # body AND into DECLARE default expressions; caller
                        # variables in the argument render as typed
                        # literals HERE (the statement-level pass skips
                        # CALL so INOUT variable names survive above)
                        a_lit = _subst_vars(caller_scope, a) if caller_scope else a
                        p_pat = rf"(?i)(?<![\w$]){re.escape(pname)}(?![\w$])"
                        body = re.sub(p_pat, a_lit, body)
                        call_decls = [
                            (vn, vt, None if vd is None else re.sub(p_pat, a_lit, vd))
                            for vn, vt, vd in call_decls
                        ]
                    # DECLAREd variables: defaults evaluate at block entry,
                    # in order (a later default may reference an earlier var)
                    for vname, vtyp, vdefault in call_decls:
                        if vtyp == "CURSOR":
                            # query text (param-substituted above) binds
                            # variable values at OPEN, not here
                            scope[vname] = [vtyp, _Cursor(vdefault)]
                            continue
                        value = (
                            None
                            if vdefault is None
                            else _eval_script_scalar(
                                spark, state, _subst_vars(scope, vdefault), vtyp
                            )
                        )
                        scope[vname] = [vtyp, value]
                    if "found" not in scope and (
                        any(t == "CURSOR" for t, _v in scope.values())
                        or re.search(
                            r"(?i)(?:^|[^\w$])(?:PERFORM|FOUND)(?:[^\w$]|$)",
                            _mask_quoted(body),
                        )
                    ):
                        # plpgsql's FOUND, maintained by FETCH, PERFORM,
                        # SELECT INTO, query-FOR exit, and
                        # INSERT/UPDATE/DELETE (r12 — EXECUTE never sets
                        # it, per plpgsql). Auto-declared only when a
                        # cursor exists or the body MENTIONS found/
                        # PERFORM, to bound the name-capture blast
                        # radius plpgsql variables inherently carry:
                        # real plpgsql reserves FOUND in every function
                        # body, so a column literally named `found`
                        # inside one is already hazardous there — but a
                        # body that never says `found` costs nothing
                        # here. Initialized FALSE per call, plpgsql's
                        # own start state.
                        #
                        # variable_conflict guard (ADVICE r12): once FOUND
                        # is live, _subst_vars rewrites every bare `found`
                        # token — a body that ALSO uses `found` as a
                        # relation column would get that column reference
                        # silently replaced by a boolean literal. Real
                        # plpgsql (variable_conflict=error) raises an
                        # ambiguity error instead; detect the two cheap
                        # reliable column spellings — a CREATE-list
                        # `(..., found <type> ...)` declaration and an
                        # `AS found` alias — and refuse loudly.
                        _masked_body = _mask_quoted(body)
                        if re.search(
                            r"(?i)[(,]\s*found\s+(?:BOOL|BOOLEAN|SMALLINT|"
                            r"INT|INTEGER|BIGINT|VARCHAR|CHAR|TEXT|REAL|"
                            r"DOUBLE|FLOAT|DECIMAL|NUMERIC|DATE|TIME)",
                            _masked_body,
                        ) or re.search(r"(?i)\bAS\s+found(?![\w$])", _masked_body):
                            raise ValueError(
                                f"CALL {name}: the body declares or aliases "
                                "a column literally named `found` while "
                                "plpgsql's FOUND variable is in effect — "
                                "ambiguous reference (plpgsql "
                                "variable_conflict=error); rename the column"
                            )
                        scope["found"] = ["BOOLEAN", False]
                    nodes = _parse_plpgsql_nodes(body)
                    if scope:
                        nodes = [_Scoped(nd, scope) for nd in nodes]
                    # RETURN's unwind target; carries the INOUT spec
                    nodes.append(_CallEnd(inout, scope, nested_call, writebacks))
                    pending.extendleft(reversed(nodes))
                    continue
                if re.match(r"(?i)^RAISE\b", raw):
                    m = _RAISE.match(raw)
                    if m is None:
                        raise ValueError(f"RAISE: unsupported form {raw[:60]!r}")
                    level = (m.group(1) or "EXCEPTION").upper()
                    if level == "EXCEPTION":
                        args = [
                            a.strip()
                            for a in _split_top_commas(m.group(3) or "")
                            if a.strip()
                        ]
                        vals = [
                            str(_eval_script_scalar(spark, state, a, "STRING"))
                            for a in args
                        ]
                        raise RuntimeError(
                            "RAISE EXCEPTION: "
                            + _format_raise_message(
                                m.group(2).replace("''", "'"), vals
                            )
                        )
                    continue  # NOTICE/INFO/WARNING/LOG/DEBUG: log-only, no-op
                # COPY/UNLOAD carry path literals and option clauses the SQL
                # rewriter must not touch — matched on the RAW statement;
                # only UNLOAD's inner query goes through the front-end.
                if m := _COPY.match(raw):
                    name, path, clause = m.group(1), m.group(2), m.group(3)
                    opts = _parse_io_options(clause, "COPY")
                    base = state.existing(name)
                    if opts["skip"] > 1:
                        # Spark CSV has no skip-N-rows option; a collapsed
                        # header flag would silently load preamble lines as
                        # data — reject loudly (module policy).
                        raise ValueError(
                            f"COPY {name}: IGNOREHEADER {opts['skip']} unsupported "
                            "(only 0 or 1); preprocess multi-line preambles upstream"
                        )
                    fmt = opts["format"] or "TEXT"  # bare COPY = pipe-delimited text
                    if opts["null_as"] is not None and fmt in ("JSON", "PARQUET"):
                        # NULL AS only means something for delimited text;
                        # silently ignoring it on JSON/PARQUET would change
                        # semantics without a trace (module policy: loud).
                        raise ValueError(
                            f"COPY {name}: NULL AS applies to delimited text "
                            f"formats only, not {fmt}"
                        )
                    if opts["jsonpaths"] is not None and fmt != "JSON":
                        raise ValueError(
                            f"COPY {name}: a jsonpaths file requires "
                            f"FORMAT JSON, not {fmt}"
                        )
                    src: str | list[str] = path
                    if opts["manifest"]:
                        # COPY ... MANIFEST: the path IS a manifest file; load
                        # exactly its listed files (missing mandatory → loud).
                        from sql_redshift_etl_spark.sources.writers import read_manifest_paths

                        src = read_manifest_paths(path)
                        if not src:
                            # A zero-row UNLOAD legitimately writes a manifest
                            # with entries:[] (no data files); Redshift's COPY
                            # of it loads zero rows. Spark's readers throw on
                            # an empty path list, so bind the target unchanged.
                            state.bind(name, base)
                            continue
                    # DATEFORMAT/TIMEFORMAT: Redshift-dialect read formats
                    # for delimited text; 'auto' = engine default. Epoch
                    # spellings and non-text formats are out of the
                    # supported subset (loud, not silently ignored).
                    fmt_opts: dict[str, str] = {}
                    epoch_unit: str | None = None
                    for key, opt_name in (("datefmt", "DATEFORMAT"), ("timefmt", "TIMEFORMAT")):
                        v = opts[key]
                        if v is None or v.lower() == "auto":
                            continue
                        if fmt in ("JSON", "PARQUET") or opts["fixedwidth"] is not None:
                            raise ValueError(
                                f"COPY {name}: {opt_name} applies to delimited "
                                "text loads only"
                            )
                        if v.lower() in ("epochsecs", "epochmillisecs"):
                            if key != "timefmt":
                                raise ValueError(
                                    f"COPY {name}: DATEFORMAT {v!r} invalid — "
                                    "epoch spellings are TIMEFORMAT-only"
                                )
                            # epoch ints: parse timestamp columns as BIGINT,
                            # convert after load (timestamp_seconds/_millis)
                            epoch_unit = "s" if v.lower() == "epochsecs" else "ms"
                            continue
                        from sql_redshift_etl_spark.functions.dialect import (
                            translate_datetime_format,
                        )

                        fmt_opts[key] = translate_datetime_format(v)
                    read_schema = base.schema
                    epoch_cols: list[str] = []
                    if epoch_unit is not None:
                        from pyspark.sql import types as T

                        swapped = []
                        for f in base.schema.fields:
                            if isinstance(f.dataType, T.TimestampType):
                                epoch_cols.append(f.name)
                                swapped.append(
                                    T.StructField(f.name, T.LongType(), f.nullable)
                                )
                            else:
                                swapped.append(f)
                        read_schema = T.StructType(swapped)
                    if opts["removequotes"] and (
                        fmt in ("JSON", "PARQUET") or opts["fixedwidth"] is not None
                    ):
                        raise ValueError(
                            f"COPY {name}: REMOVEQUOTES applies to delimited "
                            "text loads only"
                        )
                    if opts["quotechar"] is not None and fmt != "CSV":
                        raise ValueError(
                            f"COPY {name}: QUOTE AS applies to CSV only "
                            "(Redshift's own restriction)"
                        )
                    if opts["maxerror"] is not None and (
                        fmt == "PARQUET" or opts["fixedwidth"] is not None
                    ):
                        # Parquet loads are schema-checked at file level and
                        # fixed-width cuts cannot flag a malformed row —
                        # an ignored MAXERROR would be a silent contract
                        # change (module policy: loud).
                        raise ValueError(
                            f"COPY {name}: MAXERROR applies to CSV/TEXT/JSON "
                            "loads only"
                        )
                    if opts["fixedwidth"] is not None:
                        if opts["format"] is not None:
                            raise ValueError(
                                f"COPY {name}: FIXEDWIDTH excludes FORMAT "
                                f"{opts['format']} (fixed-width IS the format)"
                            )
                        from sql_redshift_etl_spark.sources.readers import read_fixed_width

                        loaded = read_fixed_width(
                            spark, src, base.schema, opts["fixedwidth"],
                            null_value=opts["null_as"],
                        )
                    elif opts["maxerror"] is not None:
                        if opts["jsonpaths"] is not None:
                            # MAXERROR composes with a jsonpaths load
                            # (r13): malformed lines consume the budget
                            # and land in stl_load_errors, same contract
                            # as the delimited path below.
                            from sql_redshift_etl_spark.sources.readers import (
                                read_json_with_paths,
                            )

                            loaded, bad = read_json_with_paths(
                                spark,
                                src,
                                base.schema,
                                opts["jsonpaths"],
                                max_error=opts["maxerror"],
                            )
                        else:
                            from sql_redshift_etl_spark.sources.readers import (
                                read_with_error_budget,
                            )

                            loaded, bad = read_with_error_budget(
                                spark,
                                src,
                                read_schema,
                                fmt,
                                max_error=opts["maxerror"],
                                header=opts["skip"] > 0,
                                delimiter=opts["delimiter"]
                                or ("," if fmt == "CSV" else "|"),
                                null_value=opts["null_as"],
                                date_format=fmt_opts.get("datefmt"),
                                timestamp_format=fmt_opts.get("timefmt"),
                            )
                        # the STL_LOAD_ERRORS analog: skipped raw records
                        # accumulate in a queryable script-scoped table
                        errs = bad.select(F.lit(name).alias("tbl"), "raw_line")
                        if "stl_load_errors" in state.tables:
                            errs = state.tables["stl_load_errors"].unionAll(errs)
                        state.bind("stl_load_errors", errs)
                    elif fmt == "JSON":
                        if opts["jsonpaths"] is not None:
                            from sql_redshift_etl_spark.sources.readers import (
                                read_json_with_paths,
                            )

                            loaded = read_json_with_paths(
                                spark, src, base.schema, opts["jsonpaths"]
                            )
                        else:
                            from sql_redshift_etl_spark.sources.readers import (
                                read_json_lines,
                            )

                            loaded = read_json_lines(spark, src, base.schema)
                    elif fmt == "PARQUET":
                        loaded = (
                            spark.read.schema(base.schema).parquet(*src)
                            if isinstance(src, list)
                            else spark.read.schema(base.schema).parquet(src)
                        )
                    else:
                        from sql_redshift_etl_spark.sources.readers import read_csv

                        loaded = read_csv(
                            spark,
                            src,
                            read_schema,
                            header=opts["skip"] > 0,
                            delimiter=opts["delimiter"] or ("," if fmt == "CSV" else "|"),
                            null_value=opts["null_as"],
                            date_format=fmt_opts.get("datefmt"),
                            timestamp_format=fmt_opts.get("timefmt"),
                            quote=opts["quotechar"],
                        )
                    for c in epoch_cols:
                        loaded = loaded.withColumn(
                            c,
                            F.timestamp_seconds(F.col(c))
                            if epoch_unit == "s"
                            else F.timestamp_millis(F.col(c)),
                        )
                    conv = [
                        k
                        for k in (
                            "blanksasnull",
                            "trimblanks",
                            "emptyasnull",
                            "ignoreblank",
                            "invchar",
                            "removequotes",
                        )
                        if opts[k]
                    ]
                    if conv and fmt == "PARQUET":
                        raise ValueError(
                            f"COPY {name}: {'/'.join(k.upper() for k in conv)} "
                            "applies to text loads only"
                        )
                    if conv:
                        # Redshift data-conversion parameters, applied to the
                        # parsed string columns before the positional cast
                        from pyspark.sql import types as T

                        for f in loaded.schema.fields:
                            if not isinstance(f.dataType, T.StringType):
                                continue
                            col = F.col(f.name)
                            if opts["removequotes"]:
                                # strip ONE pair of matching surrounding
                                # quotes (" or ') — Redshift's REMOVEQUOTES
                                # for delimited text; unmatched quotes stay
                                col = F.regexp_replace(col, "^([\"'])(.*)\\1$", "$2")
                            if opts["invchar"] is not None:
                                # ACCEPTINVCHARS: the JVM text decoder has
                                # already replaced invalid UTF-8 sequences
                                # with U+FFFD; map those to the requested
                                # replacement char (Redshift default '?')
                                col = F.regexp_replace(
                                    col, "�", opts["invchar"]
                                )
                            if opts["trimblanks"]:
                                col = F.rtrim(col)
                            if opts["blanksasnull"]:
                                col = F.when(F.trim(col) == "", F.lit(None)).otherwise(col)
                            elif opts["emptyasnull"]:
                                col = F.when(col == "", F.lit(None)).otherwise(col)
                            loaded = loaded.withColumn(f.name, col)
                        if opts["ignoreblank"]:
                            # a blank input line parses as an all-null row
                            import functools as _ft
                            import operator as _op

                            loaded = loaded.filter(
                                ~_ft.reduce(
                                    _op.and_,
                                    [F.col(c).isNull() for c in loaded.columns],
                                )
                            )
                    state.bind(name, base.unionAll(_cast_positional(loaded, base, name)))
                    continue
                if m := _UNLOAD.match(raw):
                    inner, path, clause = m.group(1), m.group(2), m.group(3)
                    opts = _parse_io_options(clause, "UNLOAD")
                    # the inner query sat inside UNLOAD's single quotes, so
                    # the statement-level schema flattening and SQL-UDF
                    # inlining skipped it (they are literal-masked) — apply
                    # both to the unescaped text before translation
                    inner_sql = inner.replace("''", "'")
                    for s in state.schemas:
                        inner_sql = _sub_outside_quotes(
                            inner_sql, rf"(?i)\b{re.escape(s)}\s*\.\s*(\w+)", rf"{s}__\1"
                        )
                    if state.funcs:
                        inner_sql = _inline_sql_udfs(inner_sql, state.funcs)
                    df = spark.sql(translate_redshift_sql(inner_sql).strip())
                    if opts["maxfilesize"] is not None:
                        # MAXFILESIZE n [MB|GB]: size the output files by
                        # repartitioning to ceil(estimated_bytes / max) —
                        # the estimate is a JSON-rendered row-size average
                        # over a 10k sample × the row count (approximate,
                        # like Redshift's own "approximately"; compression
                        # shrinks below the cap, never splits above it by
                        # more than one task's skew).
                        if not opts["parallel"]:
                            raise ValueError(
                                "UNLOAD: MAXFILESIZE with PARALLEL OFF unsupported "
                                "(a single-file write cannot split by size)"
                            )
                        avg_row = (
                            df.limit(10_000)
                            .select(
                                F.avg(
                                    F.length(F.to_json(F.struct(*df.columns)))
                                ).alias("b")
                            )
                            .first()["b"]
                        )
                        if avg_row:  # empty result → leave partitioning alone
                            import math as _math

                            n_files = max(
                                1,
                                _math.ceil(df.count() * avg_row / opts["maxfilesize"]),
                            )
                            df = (
                                df.repartition(n_files, *opts["partition_by"])
                                if opts["partition_by"]
                                else df.repartition(n_files)
                            )
                    if not opts["parallel"]:
                        df = df.coalesce(1)  # PARALLEL OFF = single output file
                    # CLEANPATH deletes what's at the prefix before writing —
                    # the same observable result as ALLOWOVERWRITE here
                    writer = df.write.mode(
                        "overwrite"
                        if (opts["overwrite"] or opts["cleanpath"])
                        else "errorifexists"
                    )
                    if opts["partition_by"]:
                        writer = writer.partitionBy(*opts["partition_by"])
                    fmt = opts["format"] or "TEXT"
                    if opts["codec"]:
                        # UNLOAD GZIP/BZIP2/ZSTD: Spark writes per-file
                        # codecs natively; codec×format support differs —
                        # parquet: gzip/zstd, text: gzip/bzip2 (no zstd
                        # codec in Spark's text sources) — loud, not silent.
                        if fmt == "PARQUET" and opts["codec"] == "bzip2":
                            raise ValueError("UNLOAD PARQUET supports GZIP or ZSTD")
                        if fmt != "PARQUET" and opts["codec"] == "zstd":
                            raise ValueError(
                                f"UNLOAD {fmt}: ZSTD is parquet-only in this engine"
                            )
                        writer = writer.option("compression", opts["codec"])
                    if opts["null_as"] is not None:
                        writer = writer.option("nullValue", opts["null_as"])
                    if opts["addquotes"] and fmt in ("PARQUET", "JSON"):
                        raise ValueError(
                            "UNLOAD: ADDQUOTES applies to delimited text only"
                        )
                    if fmt == "PARQUET":
                        writer.parquet(path)
                    elif fmt == "JSON":
                        writer.json(path)
                    else:
                        if opts["addquotes"]:
                            # ADDQUOTES: every field quoted on export (the
                            # REMOVEQUOTES round-trip partner)
                            writer = writer.option("quoteAll", True)
                        writer.option("header", opts["header"]).option(
                            "delimiter", opts["delimiter"] or ("," if fmt == "CSV" else "|")
                        ).csv(path)
                    if opts["manifest"]:
                        from sql_redshift_etl_spark.sources.writers import write_manifest

                        suffix = {"PARQUET": ".parquet", "JSON": ".json"}.get(fmt, ".csv")
                        if opts["codec"] and fmt != "PARQUET":
                            # codec'd text files end .csv.gz / .json.bz2 ...
                            suffix += {"gzip": ".gz", "bzip2": ".bz2"}[opts["codec"]]
                        write_manifest(path, suffix=suffix)
                    continue
                stmt = translate_redshift_sql(raw).strip()
                # every engine-executed statement resets ROW_COUNT (as in
                # plpgsql); the DML handlers below re-set it. plpgsql-side
                # statements (assignments, RAISE, control flow) do not.
                state.last_dml = None
                # Explicit transactions (r6): BEGIN snapshots the script
                # state, COMMIT/END discards the snapshot, ROLLBACK/ABORT
                # restores it — a real rollback, not the silent keep-changes
                # no-op it was (module policy: no silent contract changes).
                if tx := re.match(
                    r"(?i)^(BEGIN|START|COMMIT|END|ROLLBACK|ABORT)\b"
                    r"(?:\s+(?:WORK|TRANSACTION))?\s*$",
                    stmt,
                ):
                    kw = tx.group(1).upper()
                    if kw in ("BEGIN", "START"):
                        state.txn_begin()
                    elif kw in ("COMMIT", "END"):
                        state.txn_commit()
                    else:
                        state.txn_rollback()
                    continue
                if om := re.match(
                    r"(?i)^ALTER\s+TABLE\s+([\w.]+)\s+OWNER\s+TO\s+\S+\s*$", stmt
                ):
                    state.existing(om.group(1))  # must exist (loud); ownership has no analog
                    continue
                if re.match(r"(?i)^(?:CREATE|ALTER|DROP)\s+(?:USER|GROUP|ROLE)\b", stmt):
                    # account/ACL DDL: no Spark analog — accepted no-ops,
                    # the same class as GRANT/REVOKE
                    continue
                if _NOOP.match(stmt):
                    continue
                if (hm := _CREATE_EXTERNAL_HEAD.match(stmt)) and (
                    (cols_end := _scan_balanced_fwd(stmt, hm.end()))
                    and (tm := _CREATE_EXTERNAL_TAIL.match(stmt[cols_end:]))
                ):
                    name = hm.group(1)
                    cols = stmt[hm.end() : cols_end - 1]
                    part_cols, delim, stored, loc = tm.groups()
                    from pyspark.sql import types as T

                    def _lowered(ddl: str):
                        parsed = T.StructType.fromDDL(_normalize_ddl_types(ddl))
                        return T.StructType(
                            [
                                T.StructField(
                                    f.name,
                                    T.StringType()
                                    if isinstance(f.dataType, (T.VarcharType, T.CharType))
                                    else f.dataType,
                                    f.nullable,
                                )
                                for f in parsed.fields
                            ]
                        )

                    if stored.upper() == "PARQUET":
                        reader = spark.read.option("basePath", loc)
                        # parquet is self-describing; the declared column
                        # list is validated against the files below, and
                        # hive PARTITIONED BY columns come from the
                        # directory layout (Spark partition discovery).
                        try:
                            ext = reader.parquet(loc)
                        except Exception as e:
                            if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                                raise
                            # empty prefix (e.g. a zero-row UNLOAD): the
                            # external is an EMPTY table with the DECLARED
                            # schema — Redshift's behavior; crashing would
                            # make empty upstream slices fatal.
                            full = cols + ("," + part_cols if part_cols else "")
                            state.bind(name, spark.createDataFrame([], _lowered(full)))
                            continue
                        declared_fields = list(_lowered(cols).fields) + (
                            list(_lowered(part_cols).fields) if part_cols else []
                        )
                        actual = [c.lower() for c in ext.columns]
                        missing = [
                            f.name.lower()
                            for f in declared_fields
                            if f.name.lower() not in actual
                        ]
                        if missing:
                            raise ValueError(
                                f"CREATE EXTERNAL TABLE {name}: declared columns "
                                f"{missing} not present at {loc} (files have {actual})"
                            )
                        # Bind the DECLARED schema, not the file schema:
                        # exactly the declared (+ partition) columns, each
                        # cast to its declared type — Spectrum's contract.
                        # Undeclared file columns are invisible to SELECT *.
                        by_lower = {c.lower(): c for c in ext.columns}
                        ext = ext.select(
                            *[
                                F.col(by_lower[f.name.lower()])
                                .cast(f.dataType)
                                .alias(f.name)
                                for f in declared_fields
                            ]
                        )
                    else:
                        if part_cols:
                            raise ValueError(
                                "CREATE EXTERNAL TABLE ... TEXTFILE with PARTITIONED "
                                "BY is not supported; use PARQUET for partitioned "
                                "externals"
                            )
                        from sql_redshift_etl_spark.sources.readers import read_csv

                        # read schemas reject char/varchar — lower to string,
                        # the same rule the CREATE TABLE DDL branch applies
                        ext = read_csv(
                            spark,
                            loc,
                            _lowered(cols),
                            header=False,
                            delimiter=delim or "|",
                        )
                    state.bind(name, ext)
                elif m := _CREATE_LIKE.match(stmt):
                    # CREATE TABLE new (LIKE other): empty table with other's
                    # schema — the first half of Redshift's rebuild-and-swap
                    # publish idiom. (Checked before CTAS/DDL: its "(LIKE x)"
                    # body would otherwise parse as a column list.) Identity
                    # attributes inherit, as in Redshift's LIKE.
                    state.drop_meta(m.group(1))  # rebind clears
                    if m.group(2) in state.identity_cols:
                        state.identity_cols[m.group(1)] = dict(state.identity_cols[m.group(2)])
                    if m.group(2) in state.default_cols and (m.group(3) or "").upper() == "INCLUDING":
                        # Redshift LIKE copies defaults only under
                        # INCLUDING DEFAULTS (EXCLUDING is the default)
                        state.default_cols[m.group(1)] = dict(state.default_cols[m.group(2)])
                    state.bind(m.group(1), state.existing(m.group(2)).limit(0))
                elif m := _ALTER_RENAME.match(stmt):
                    # ALTER TABLE a RENAME TO b: the atomic-swap publish step.
                    # The resolved DataFrame moves to the new name; the old
                    # name is dropped from script scope (a caller-registered
                    # view of the old name is restored by cleanup only if a
                    # script statement had already shadowed it — same scope
                    # rule as DROP TABLE).
                    old, new = m.group(1), m.group(2)
                    df = state.existing(old)
                    spark.catalog.dropTempView(old)
                    state.tables.pop(old, None)
                    state.created_views.discard(old)
                    state.drop_meta(new)  # overwritten target's dies
                    if old in state.identity_cols:
                        state.identity_cols[new] = state.identity_cols.pop(old)
                    if old in state.default_cols:
                        state.default_cols[new] = state.default_cols.pop(old)
                    state.bind(new, df)
                elif m := _ALTER_APPEND.match(stmt):
                    # ALTER TABLE tgt APPEND FROM src: Redshift's move-rows
                    # publish (faster than INSERT+DELETE because it moves
                    # blocks). Here: append src's rows positionally-cast to
                    # the target schema, then empty src — same observable
                    # state. IGNOREEXTRA/FILLTARGET accepted; the positional
                    # cast already errors loudly on a width mismatch.
                    tgt, src_name = m.group(1), m.group(2)
                    base = state.existing(tgt)
                    src_df = state.existing(src_name)
                    state.bind(tgt, base.unionAll(_cast_positional(src_df, base, tgt)))
                    state.bind(src_name, src_df.limit(0))
                elif m := _ALTER_COL_TYPE.match(stmt):
                    # ALTER COLUMN c TYPE t (Redshift's varchar-resize /
                    # type-migration op): cast in place, keeping position
                    name, col, typ = m.groups()
                    base = state.existing(name)
                    actual = {c.lower(): c for c in base.columns}
                    if col.lower() not in actual:
                        raise ValueError(f"ALTER TABLE {name}: no column {col!r} to alter")
                    from pyspark.sql import types as T

                    f = T.StructType.fromDDL(f"x {_normalize_ddl_types(typ)}").fields[0]
                    dt = (
                        T.StringType()
                        if isinstance(f.dataType, (T.VarcharType, T.CharType))
                        else f.dataType
                    )
                    c0 = actual[col.lower()]
                    state.bind(
                        name,
                        base.select(
                            *[
                                F.col(c).cast(dt).alias(c) if c == c0 else F.col(c)
                                for c in base.columns
                            ]
                        ),
                    )
                elif m := _ALTER_ADD_COL.match(stmt):
                    # ALTER TABLE t ADD COLUMN c type [DEFAULT lit]: existing
                    # rows take the default (NULL absent one) — Redshift's
                    # backfill. char/varchar lower to string as in CREATE.
                    name, col, typ, default = m.groups()
                    base = state.existing(name)
                    if col.lower() in {c.lower() for c in base.columns}:
                        raise ValueError(f"ALTER TABLE {name}: column {col!r} already exists")
                    from pyspark.sql import types as T

                    f = T.StructType.fromDDL(f"x {_normalize_ddl_types(typ)}").fields[0]
                    dt = (
                        T.StringType()
                        if isinstance(f.dataType, (T.VarcharType, T.CharType))
                        else f.dataType
                    )
                    val = F.expr(default).cast(dt) if default else F.lit(None).cast(dt)
                    if default:
                        # future INSERTs omitting the column also take the
                        # default, not just the backfill of existing rows
                        state.default_cols.setdefault(name, {})[col] = default
                    state.bind(name, base.withColumn(col, val))
                elif m := _ALTER_DROP_COL.match(stmt):
                    name, col = m.groups()
                    base = state.existing(name)
                    actual = {c.lower(): c for c in base.columns}
                    if col.lower() not in actual:
                        raise ValueError(f"ALTER TABLE {name}: no column {col!r} to drop")
                    state.bind(name, base.drop(actual[col.lower()]))
                    ids = state.identity_cols.get(name)
                    if ids:  # dropping the identity column kills its generator
                        ids.pop(actual[col.lower()], None)
                    dfs = state.default_cols.get(name)
                    if dfs:  # ... and its default
                        dfs.pop(actual[col.lower()], None)
                elif m := _ALTER_RENAME_COL.match(stmt):
                    name, old_c, new_c = m.groups()
                    base = state.existing(name)
                    actual = {c.lower(): c for c in base.columns}
                    if old_c.lower() not in actual:
                        raise ValueError(f"ALTER TABLE {name}: no column {old_c!r} to rename")
                    state.bind(name, base.withColumnRenamed(actual[old_c.lower()], new_c))
                    ids = state.identity_cols.get(name)
                    if ids and actual[old_c.lower()] in ids:
                        ids[new_c] = ids.pop(actual[old_c.lower()])
                    dfs = state.default_cols.get(name)
                    if dfs and actual[old_c.lower()] in dfs:
                        dfs[new_c] = dfs.pop(actual[old_c.lower()])
                elif m := _CTAS_COLS.match(stmt):
                    # CREATE TABLE t (a, b) AS SELECT: positional rename
                    name, cols, query = m.groups()
                    names = [c.strip() for c in cols.split(",")]
                    df = spark.sql(query)
                    if len(names) != len(df.columns):
                        raise ValueError(
                            f"CREATE TABLE {name}: column list has {len(names)} "
                            f"names, query returns {len(df.columns)} columns"
                        )
                    state.drop_meta(name)
                    state.bind(name, df.toDF(*names))
                elif m := _CTAS.match(stmt):
                    state.drop_meta(m.group(1))  # rebind clears
                    state.bind(m.group(1), spark.sql(m.group(2)))
                elif m := _CREATE_VIEW.match(stmt):
                    state.drop_meta(m.group(1))
                    state.bind(m.group(1), spark.sql(m.group(2)))
                elif m := _CREATE_MV.match(stmt):
                    state.drop_meta(m.group(1))
                    state.mv_defs[m.group(1)] = m.group(2)
                    state.bind(m.group(1), spark.sql(m.group(2)))
                elif m := _REFRESH_MV.match(stmt):
                    if m.group(1) not in state.mv_defs:
                        raise ValueError(
                            f"REFRESH MATERIALIZED VIEW: {m.group(1)!r} is not a "
                            "materialized view created by this script"
                        )
                    # re-run the defining query against current bindings —
                    # Redshift's stale-until-REFRESH contract
                    state.bind(m.group(1), spark.sql(state.mv_defs[m.group(1)]))
                elif m := _CREATE_DDL.match(stmt):
                    # Spark parses DDL-format schemas ("a BIGINT, b
                    # VARCHAR(32)") directly — Redshift storage clauses were
                    # already stripped by the front-end. CHAR/VARCHAR lower
                    # to plain STRING (Spark's own CTAS behavior; an empty
                    # LogicalRDD may not carry char/varchar types).
                    from pyspark.sql import types as T

                    ddl_body = _normalize_ddl_types(m.group(2))
                    state.drop_meta(m.group(1))  # rebind clears
                    defaults = {
                        c: lit for c, _typ, lit in _DEFAULT_ATTR.findall(ddl_body)
                    }
                    if defaults:
                        ddl_body = _DEFAULT_ATTR.sub(r"\1 \2", ddl_body)
                        state.default_cols[m.group(1)] = defaults
                    ids = {
                        c: int(seed)
                        for c, _typ, seed, _step in _IDENTITY_ATTR.findall(ddl_body)
                    }
                    if ids:
                        # IDENTITY(seed, step): record the columns, strip the
                        # attribute (fromDDL cannot parse it). Values
                        # auto-generate on INSERTs that omit the column —
                        # unique and ascending, NOT consecutive, which is
                        # Redshift's own IDENTITY contract (its docs: values
                        # "might not be consecutive").
                        ddl_body = _IDENTITY_ATTR.sub(r"\1 \2", ddl_body)
                        state.identity_cols[m.group(1)] = ids
                    schema = T.StructType.fromDDL(ddl_body)
                    fields = [
                        T.StructField(
                            f.name,
                            T.StringType()
                            if isinstance(f.dataType, (T.VarcharType, T.CharType))
                            else f.dataType,
                            f.nullable,
                        )
                        for f in schema.fields
                    ]
                    state.bind(m.group(1), spark.createDataFrame([], schema=T.StructType(fields)))
                elif m := _INSERT_DEFAULTS.match(stmt):
                    # INSERT INTO t DEFAULT VALUES: one row of declared
                    # defaults (identity generates, unattributed → NULL)
                    name = m.group(1)
                    base = state.existing(name)
                    dflts = state.default_cols.get(name, {})
                    ids = state.identity_cols.get(name, {})
                    exprs = []
                    for f in base.schema.fields:
                        if f.name in ids:
                            prior = base.agg(F.max(f.name)).first()[0]
                            start = ids[f.name] if prior is None else int(prior) + 1
                            exprs.append(F.lit(start).cast(f.dataType).alias(f.name))
                        elif f.name in dflts:
                            exprs.append(F.expr(dflts[f.name]).cast(f.dataType).alias(f.name))
                        else:
                            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
                    bound = base.unionAll(spark.range(1).select(*exprs))
                    if any(_VOLATILE_DEFAULT.search(d) for d in dflts.values()):
                        # a clock default must not re-evaluate per action
                        bound = bound.localCheckpoint(eager=True)
                    state.bind(name, bound)
                    state.last_dml = 1
                    _mark_found_dml(scope, state)
                elif m := _INSERT.match(stmt):
                    name, cols, query = m.group(1), m.group(2), m.group(3)
                    base = state.existing(name)
                    sel = spark.sql(query)
                    if cols:
                        listed = [c.strip() for c in cols.split(",")]
                        if len(listed) != len(sel.columns):
                            raise ValueError(
                                f"INSERT INTO {name}: column list has {len(listed)} "
                                f"names, query returns {len(sel.columns)} columns"
                            )
                        # SQL identifiers are case-insensitive: resolve the
                        # listed names against the target schema, loudly.
                        target_by_lower = {f.name.lower(): f.name for f in base.schema.fields}
                        unknown = [c for c in listed if c.lower() not in target_by_lower]
                        if unknown:
                            raise ValueError(
                                f"INSERT INTO {name}: unknown columns {unknown} "
                                f"(table has {list(target_by_lower.values())})"
                            )
                        by_name = {
                            target_by_lower[c.lower()]: src for c, src in zip(listed, sel.columns)
                        }
                        # Alias every projection to the target column name —
                        # multiple unlisted columns would otherwise all be
                        # named `NULL` and break the positional re-select.
                        id_cols = state.identity_cols.get(name, {})
                        filled_identity = False

                        def _fill(f):  # unlisted → identity value or NULL
                            nonlocal filled_identity
                            if f.name in by_name:
                                return F.col(by_name[f.name])
                            if f.name in id_cols:
                                # unique ascending ids above everything already
                                # in the table (1-row max lookup — metadata
                                # scale, the same legitimate driver-side class
                                # as JDBC partition bounds); within the batch
                                # monotonically_increasing_id is unique.
                                filled_identity = True
                                prior = base.agg(F.max(f.name)).first()[0]
                                start = id_cols[f.name] if prior is None else int(prior) + 1
                                from pyspark.sql import types as T

                                if isinstance(
                                    f.dataType, (T.IntegerType, T.ShortType, T.ByteType)
                                ):
                                    # mid() values (partitionId*2^33 + n) wrap
                                    # a narrow column under non-ANSI casts.
                                    # A narrow identity type caps the TABLE at
                                    # the type's own range anyway, so a dense
                                    # scheme (row_number over mono-id — one
                                    # single-partition window, bounded by that
                                    # same range) is both safe and honest.
                                    from pyspark.sql import Window as _W

                                    return (
                                        F.row_number().over(
                                            _W.orderBy(F.monotonically_increasing_id())
                                        )
                                        + F.lit(start - 1)
                                    )
                                return F.monotonically_increasing_id() + F.lit(start)
                            if f.name in state.default_cols.get(name, {}):
                                # unlisted + declared DEFAULT → the default
                                # literal, not NULL (Redshift's contract)
                                dflt = state.default_cols[name][f.name]
                                if _VOLATILE_DEFAULT.search(dflt):
                                    filled_identity = True  # clock defaults pin too
                                return F.expr(dflt)
                            return F.lit(None)

                        sel = sel.select(
                            *[_fill(f).alias(f.name) for f in base.schema.fields]
                        )
                    delta = _cast_positional(sel, base, name)
                    state.last_dml = delta  # rows inserted (counted on demand)
                    _mark_found_dml(scope, state)
                    bound = base.unionAll(delta)
                    if cols and filled_identity:
                        # pin generated ids: monotonically_increasing_id is
                        # nondeterministic across re-evaluations, and a bound
                        # table is read by every later statement — two
                        # downstream actions must see the SAME ids (the same
                        # reason UPDATE...FROM pins its rowids).
                        bound = bound.localCheckpoint(eager=True)
                    state.bind(name, bound)
                elif m := _MERGE.match(stmt):
                    _run_merge_into(spark, state, m.group(1), m.group(2) or m.group(1), m.group(3))
                elif m := _DELETE.match(stmt):
                    name, rest = m.group(1), m.group(2)
                    state.existing(name)  # must exist (loud failure)
                    if rest is None:
                        state.last_dml = state.existing(name)  # all rows deleted
                        state.bind(name, state.existing(name).limit(0))
                        _mark_found_dml(scope, state)
                    elif um := re.match(r"(?is)^USING\s+(.+)$", rest):
                        # DELETE FROM t USING s [, s2] WHERE cond (r5): the
                        # join-based delete (retention/dedup jobs). A row is
                        # deleted when ANY source row satisfies cond —
                        # exactly NOT EXISTS for the survivors, which Spark
                        # plans as a left-anti join.
                        using, where = _split_top_kw(um.group(1), "WHERE")
                        if where is None:
                            raise ValueError(
                                f"DELETE FROM {name} USING requires a WHERE join "
                                "condition (an unconditioned delete-all is spelled "
                                "without USING)"
                            )
                        # the deleted set, captured (lazily) BEFORE the
                        # rebind so ROW_COUNT sees this statement's view
                        state.last_dml = spark.sql(
                            f"SELECT {name}.* FROM {name} WHERE EXISTS "
                            f"(SELECT 1 FROM {using} WHERE {where})"
                        )
                        state.bind(
                            name,
                            spark.sql(
                                f"SELECT {name}.* FROM {name} WHERE NOT EXISTS "
                                f"(SELECT 1 FROM {using} WHERE {where})"
                            ),
                        )
                        _mark_found_dml(scope, state)
                    elif wm := re.match(r"(?is)^WHERE\s+(.+)$", rest):
                        # DELETE removes rows where cond IS TRUE; NULL-cond
                        # rows are kept. Through spark.sql so IN/EXISTS
                        # subqueries in the predicate resolve.
                        state.last_dml = spark.sql(
                            f"SELECT * FROM {name} WHERE coalesce(({wm.group(1)}), false)"
                        )
                        state.bind(
                            name,
                            spark.sql(
                                f"SELECT * FROM {name} WHERE NOT coalesce(({wm.group(1)}), false)"
                            ),
                        )
                        _mark_found_dml(scope, state)
                    else:
                        raise ValueError(
                            f"DELETE FROM {name}: expected WHERE or USING, got {rest[:40]!r}"
                        )
                elif m := _UPDATE.match(stmt):
                    name, rest = m.group(1), m.group(2)
                    sets_from, cond = _split_set_where(rest)
                    sets, from_text = _split_top_kw(sets_from, "FROM")
                    base = state.existing(name)
                    assigned = dict(_split_assignments(sets))
                    unknown = set(assigned) - set(base.columns)
                    if unknown:
                        raise ValueError(f"UPDATE {name}: unknown columns {sorted(unknown)}")
                    if from_text:
                        # UPDATE t SET ... FROM s [, s2] WHERE cond — the
                        # join-based update every Redshift ETL uses. Semantics
                        # matched exactly: each TARGET row updates AT MOST
                        # ONCE even when the join matches several source rows
                        # (Redshift leaves which match wins unspecified; we
                        # pick deterministically by ordering on the new
                        # values). Implemented with a synthetic rowid:
                        # localCheckpoint pins the ids so the match join and
                        # the final left join see the SAME rows — without it
                        # a nondeterministic base (e.g. IDENTITY inserts)
                        # could re-evaluate differently per use.
                        if cond is None:
                            raise ValueError(
                                f"UPDATE {name} ... FROM requires a WHERE join condition "
                                "(an unconditioned cross-table update is almost never meant)"
                            )
                        rid = base.withColumn(
                            "__rid", F.monotonically_increasing_id()
                        ).localCheckpoint(eager=True)
                        state.bind(name, rid)
                        new_cols = ", ".join(
                            f"({e}) AS __new_{c}" for c, e in assigned.items()
                        )
                        matched = spark.sql(
                            f"SELECT {name}.__rid AS __rid, {new_cols} "
                            f"FROM {name}, {from_text} WHERE {cond}"
                        )
                        from pyspark.sql import Window as _W

                        one = (
                            matched.withColumn(
                                "__rn",
                                F.row_number().over(
                                    _W.partitionBy("__rid").orderBy(
                                        *[f"__new_{c}" for c in assigned]
                                    )
                                ),
                            )
                            .where(F.col("__rn") == 1)
                            .drop("__rn")
                            .withColumn("__m", F.lit(True))
                        )
                        joined = rid.join(one, "__rid", "left")
                        proj = [
                            (
                                F.when(
                                    F.col("__m"),
                                    F.col(f"__new_{f.name}").cast(f.dataType),
                                )
                                .otherwise(F.col(f.name))
                                .alias(f.name)
                                if f.name in assigned
                                else F.col(f.name)
                            )
                            for f in base.schema.fields
                        ]
                        state.last_dml = one.select("__rid")  # target rows updated
                        state.bind(name, joined.select(*proj))
                        _mark_found_dml(scope, state)
                        continue
                    cond = cond or "true"
                    # updated set captured before the rebind (ROW_COUNT)
                    state.last_dml = spark.sql(
                        f"SELECT 1 AS __one FROM {name} WHERE coalesce(({cond}), false)"
                    )
                    proj = []
                    for f in base.schema.fields:
                        if f.name in assigned:
                            proj.append(
                                f"CASE WHEN coalesce(({cond}), false) "
                                f"THEN CAST(({assigned[f.name]}) AS {f.dataType.simpleString()}) "
                                f"ELSE {f.name} END AS {f.name}"
                            )
                        else:
                            proj.append(f.name)
                    state.bind(name, spark.sql(f"SELECT {', '.join(proj)} FROM {name}"))
                    _mark_found_dml(scope, state)
                elif m := _TRUNCATE.match(stmt):
                    state.last_dml = state.existing(m.group(1))
                    state.bind(m.group(1), state.existing(m.group(1)).limit(0))
                elif m := _DROP.match(stmt):
                    for name in (n.strip() for n in m.group(1).split(",")):
                        spark.catalog.dropTempView(name)
                        state.tables.pop(name, None)
                        state.created_views.discard(name)
                        # DDL attributes (IDENTITY/DEFAULT) die with the table
                        # — a later CREATE of the same name without them must
                        # insert NULLs, not resurrect the old behavior
                        state.drop_meta(name)
                        state.mv_defs.pop(name, None)
                elif sm := re.match(r"(?is)^SET\s+(\w+)\s*(?:=|TO)\s+(\S.*)$", stmt):
                    # warehouse session knobs (enable_result_cache_for_
                    # session, wlm_query_slot_count, statement_timeout, ...)
                    # have no Spark analog — accepted no-ops, EXCEPT
                    # search_path, which changes name resolution: resolved
                    # read-side against declared schemas (_apply_search_path).
                    if sm.group(1).lower() == "search_path":
                        names = [
                            p.strip().strip("'\"").lower()
                            for p in sm.group(2).split(",")
                            if p.strip()
                        ]
                        # '$user' and 'public' are Redshift's defaults; other
                        # undeclared names would silently resolve nothing —
                        # loud, not ignored (module policy)
                        unknown = [
                            s
                            for s in names
                            if s not in state.schemas and s not in ("$user", "public")
                        ]
                        if unknown:
                            raise ValueError(
                                f"SET search_path: undeclared schema(s) "
                                f"{', '.join(unknown)} — CREATE SCHEMA first"
                            )
                        state.search_path = [s for s in names if s in state.schemas]
                elif re.match(r"(?is)^(?:EXPLAIN|SHOW)\b", stmt):
                    # EXPLAIN/SHOW pass straight to Spark; the plan/setting
                    # text is engine-specific by nature
                    result = spark.sql(stmt)
                elif _QUERY.match(stmt):
                    # SELECT ... INTO name FROM ... (Redshift's SELECT INTO,
                    # the one-line CTAS): bind the projection to the name.
                    # Top-level split only — an INTO inside a subquery or
                    # string stays content.
                    if stmt[:6].upper() == "SELECT":
                        head, tail = _split_top_kw(stmt, "INTO")
                        if tail is not None:
                            if re.match(r"(?is)^\s*STRICT\b", tail):
                                # STRICT only exists in the plpgsql
                                # variable form — reaching the CTAS path
                                # means the INTO names are not declared
                                # variables (or STRICT appeared outside a
                                # procedure body). Loud, never a table
                                # named 'strict'.
                                raise ValueError(
                                    "SELECT INTO STRICT: every INTO name "
                                    "must be a declared variable (STRICT "
                                    "exists only in the plpgsql variable "
                                    "form)"
                                )
                            tm = re.match(r"(?is)^(?:TEMP(?:ORARY)?\s+)?([\w.]+)\s+(FROM\b.*)$", tail)
                            if tm is None:
                                raise ValueError(
                                    f"SELECT INTO: expected 'INTO [TEMP] name FROM ...', "
                                    f"got INTO {tail[:40]!r}"
                                )
                            state.bind(tm.group(1), spark.sql(f"{head} {tm.group(2)}"))
                            continue
                    result = spark.sql(stmt)
                else:
                    raise ValueError(f"unsupported statement in script: {stmt[:80]!r}...")
            except Exception as exc:
                # plpgsql EXCEPTION WHEN OTHERS: an execution error inside
                # a guarded block unwinds to the block's end marker,
                # rolls the script state back to block entry, and runs the
                # handler. The runner's own unsupported-construct
                # ValueErrors stay loud by module policy: a real engine
                # would have executed those statements, so routing them to
                # a handler would silently change semantics.
                if not guard_stack or isinstance(exc, ValueError):
                    raise
                g = guard_stack.pop()
                state.guard_depth = len(guard_stack)
                while pending:
                    nxt = pending.popleft()
                    inner = nxt.item if isinstance(nxt, _Scoped) else nxt
                    if isinstance(inner, _DeclEnd):
                        # the catch unwinds past an inner DECLARE block:
                        # its names must not leak into the handler
                        inner.restore()
                    if nxt is g["end"]:
                        break
                else:
                    raise  # end marker lost — internal error, stay loud
                state.restore(g["snap"])
                # the rolled-back DML's affected-count is stale — reading
                # ROW_COUNT in the handler must be loud, never a count of
                # undone effects
                state.last_dml = None
                # cursors OPENed after the snapshot buffered rows from the
                # rolled-back bindings — close them (plpgsql closes cursors
                # opened inside an aborted block). Identity check: a cursor
                # CLOSEd and re-OPENed inside the block holds a NEW buffer
                # object under the old name and must close too.
                for n, e in (g["scope"] or {}).items():
                    if (
                        e[0] == "CURSOR"
                        and e[1].rows is not None
                        and e[1].rows is not g["open_cursors"].get(n)
                    ):
                        e[1].rows = None
                handler = _sub_outside_quotes(
                    g["handler"],
                    r"(?i)(?<![\w$])SQLERRM(?![\w$])",
                    lambda _m, _s=_sqlerrm(exc): _s,
                )
                handler = _sub_outside_quotes(
                    handler,
                    r"(?i)(?<![\w$])SQLSTATE(?![\w$])",
                    lambda _m, _s=f"'{_classify_sqlstate(exc)}'": _s,
                )
                nodes = _parse_plpgsql_nodes(handler)
                if g["scope"]:
                    nodes = [_Scoped(nd, g["scope"]) for nd in nodes]
                pending.extendleft(reversed(nodes))
                continue
        return result
    finally:
        state.cleanup()
