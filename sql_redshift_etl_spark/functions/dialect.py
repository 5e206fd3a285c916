"""Redshift-dialect → Spark translation helpers.

This is the "thin dialect layer" from SURVEY.md §4: Redshift scalar
functions that Spark spells differently, plus oracle-exactness helpers.

Oracle-exactness design (SURVEY.md §4 / FIXTURES.md gotchas): floating
sums differ across engines because summation order differs, so every
hash-checked aggregate goes through **exact decimal arithmetic** and is
cast back to double only at the end:

    SUM(CAST(x AS DECIMAL(18,s)))  — exact, order-insensitive
    → CAST(... AS DOUBLE)          — deterministic single rounding

As long as the scaled sum stays under 2^53 (true by orders of magnitude
at every fixture sf, and auditable at 100 TB by widening the scale), the
resulting double is bit-identical in Spark and DuckDB. Averages divide
that exact-sum double by an exact bigint count — IEEE-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# exact-aggregate helpers
# ---------------------------------------------------------------------------

# Oracle-side (DuckDB SQL) twin of one_rate(): the exact-decimal literal
# 1 used in (1 - discount) products — ONE definition so the builder and
# oracle decimal widths cannot drift (consumed by operators/tpch*.py).
ONE_DEC_SQL = "CAST(1 AS DECIMAL(18,2))"


def dec(c: ColumnOrName, scale: int = 2, precision: int = 18) -> Column:
    """Cast to a fixed-point decimal for exact, order-insensitive math."""
    return _col(c).cast(f"decimal({precision},{scale})")


def money(c: ColumnOrName) -> Column:
    """Money amount < 10^6 (FIXTURES.md: l_extendedprice < 105k) as
    DECIMAL(8,2). Narrow on purpose: Spark backs decimals with a plain
    long while precision ≤ 18, so keeping PRODUCTS under that bound —
    money(8,2) × rate-expr(4..9,·) tops out at precision 18 — stays on
    the long fast path instead of per-row java.math.BigDecimal (measured
    1.6× on the flagship at sf1; values are identical because decimal
    multiplication is exact at any width: scales add, nothing rounds).
    The SUM accumulator still widens (Spark adds +10 digits), so totals
    carry exactly regardless of row count."""
    return dec(c, 2, 8)


def rate(c: ColumnOrName) -> Column:
    """Discount/tax-style fraction ≤ 0.10 as DECIMAL(3,2) — see money()."""
    return dec(c, 2, 3)


def one_rate() -> Column:
    """Literal 1 in the rate domain, for (1 - d)/(1 + t) expressions."""
    return F.lit(1).cast("decimal(3,2)")


def dsum(c: ColumnOrName, scale: int = 2, precision: int = 18) -> Column:
    """Exact decimal SUM surfaced as double (bit-identical across engines).

    Pass a domain-narrow ``precision`` when the value bound is known —
    Spark widens the SUM accumulator by +10 digits, so precision ≤ 8
    keeps the accumulator ≤ 18 on the long-backed fast path instead of
    per-row 128-bit decimals (measured 1.29× on the sf10 daily-events
    aggregate, values identical: decimal addition is exact at any
    width that fits, and (8,2) carries sums to 10^6 per group-row ×
    10^10 headroom). The DuckDB oracle keeps DECIMAL(18,2) — same
    rationals, same double."""
    return F.sum(dec(c, scale, precision)).cast("double")


def davg(c: ColumnOrName, scale: int = 2) -> Column:
    """AVG as exact-decimal-sum double / count — IEEE-deterministic."""
    return F.sum(dec(c, scale)).cast("double") / F.count(_col(c))


# ---------------------------------------------------------------------------
# Redshift scalar surface
# ---------------------------------------------------------------------------

def nvl(c: ColumnOrName, *others: ColumnOrName) -> Column:
    """Redshift NVL(a, b, ...) == COALESCE."""
    return F.coalesce(_col(c), *[_col(o) for o in others])


def nvl2(c: ColumnOrName, if_not_null: Column, if_null: Column) -> Column:
    """Redshift NVL2(expr, not_null_val, null_val)."""
    return F.when(_col(c).isNotNull(), if_not_null).otherwise(if_null)


def decode(c: ColumnOrName, *pairs, default: Column | None = None) -> Column:
    """Redshift DECODE(expr, search1, result1, ..., [default]).

    ``decode(col, ("A", lit(1)), ("B", lit(2)), default=lit(0))``
    """
    expr: Column | None = None
    col = _col(c)
    for search, result in pairs:
        cond = col.eqNullSafe(F.lit(search)) if search is not None else col.isNull()
        expr = F.when(cond, result) if expr is None else expr.when(cond, result)
    assert expr is not None, "DECODE needs at least one (search, result) pair"
    return expr.otherwise(default) if default is not None else expr


def split_part(c: ColumnOrName, delim: str, part: int) -> Column:
    """Redshift SPLIT_PART (1-based; '' when out of range)."""
    return F.split_part(_col(c), F.lit(delim), F.lit(part))


def json_extract_path_text(c: ColumnOrName, *path: str) -> Column:
    """Redshift JSON_EXTRACT_PATH_TEXT(json, 'a', 'b') → get_json_object $.a.b."""
    return F.get_json_object(_col(c), "$." + ".".join(path))


def listagg(c: ColumnOrName, sep: str = ",") -> Column:
    """Redshift LISTAGG(x, sep) WITHIN GROUP (ORDER BY x).

    Spark's collect_list order is partition-nondeterministic, so sort
    explicitly — this both matches Redshift's WITHIN GROUP and makes the
    result oracle-stable (DuckDB: string_agg(x, sep ORDER BY x)).
    """
    return F.array_join(F.array_sort(F.collect_list(_col(c))), sep)


# TO_CHAR: Redshift (Postgres-style) datetime format → Spark datetime pattern.
# Longest-match first (MONTH before MON, DDD before DD, DAY before DY);
# single unmapped letters become quoted literals (tested behavior for
# separators like 'YYYYxMM'), which is safe only because every
# multi-letter name token Redshift defines is mapped here.
# Deviation, documented: Redshift blank-pads MONTH/DAY to 9 chars by
# default; we emit fill-mode names ('JULY' not 'JULY     '), matching
# DuckDB strftime and Redshift's FMMonth behavior.
_TO_CHAR_MAP: list[tuple[str, str]] = [
    ("YYYY", "yyyy"),
    ("YY", "yy"),
    ("MONTH", "MMMM"),
    ("MON", "MMM"),
    ("MM", "MM"),
    ("DDD", "DDD"),
    ("DD", "dd"),
    ("DAY", "EEEE"),
    ("DY", "EEE"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("HH", "hh"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("MS", "SSS"),
    ("AM", "a"),
    ("PM", "a"),
    ("Q", "q"),
]


def translate_datetime_format(rs_fmt: str) -> str:
    """Translate a Redshift TO_CHAR datetime format string to Spark's.

    Redshift quotes literal text with double quotes ('YYYY"T"HH24');
    Spark's DateTimeFormatter quotes with single quotes, doubling an
    embedded quote — so ``"T"`` becomes ``'T'``. Note the result can
    contain single quotes: callers splicing it back into a single-quoted
    SQL literal must escape them (see redshift_sql._fmt_literal)."""
    out: list[str] = []
    i = 0
    while i < len(rs_fmt):
        if rs_fmt[i] == '"':
            end = rs_fmt.find('"', i + 1)
            if end == -1:
                raise ValueError(f"unterminated quoted literal in format: {rs_fmt!r}")
            literal = rs_fmt[i + 1 : end]
            if literal:
                out.append("'" + literal.replace("'", "''") + "'")
            i = end + 1
            continue
        for rs, sp in _TO_CHAR_MAP:
            if rs_fmt.startswith(rs, i):
                out.append(sp)
                i += len(rs)
                break
        else:
            ch = rs_fmt[i]
            # Quote letters Spark would interpret as pattern chars.
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def tochar_needs_upper(rs_fmt: str) -> bool:
    """Redshift/Postgres TO_CHAR case semantics: an UPPERCASE name token
    (MON/MONTH/DY/DAY) emits UPPERCASE names ('JUL', 'THU'), which
    Spark's pattern letters cannot express. When the format contains
    such a token and NO lowercase characters anywhere (so no mixed-case
    token or literal text gets clobbered), wrapping the whole rendered
    string in upper() is exact — digits, punctuation, and AM/PM are
    case-invariant."""
    return bool(
        __import__("re").search(r"MON(TH)?|DAY|DY", rs_fmt)
    ) and not any(ch.islower() for ch in rs_fmt)


def to_char(c: ColumnOrName, rs_fmt: str) -> Column:
    """Redshift TO_CHAR(ts, fmt) with format-dialect translation and
    Redshift's uppercase-name-token case semantics (tochar_needs_upper)."""
    rendered = F.date_format(_col(c), translate_datetime_format(rs_fmt))
    return F.upper(rendered) if tochar_needs_upper(rs_fmt) else rendered


def redshift_datediff(unit: str, start: ColumnOrName, end: ColumnOrName) -> Column:
    """Redshift DATEDIFF(unit, a, b): counts *boundary crossings*, not
    elapsed units — e.g. DATEDIFF(year, '2020-12-31', '2021-01-01') = 1.

    Implemented as the difference of date_trunc'd endpoints, which is the
    same contract DuckDB's date_diff uses — so this is oracle-exact.
    """
    unit = unit.lower()
    s, e = _col(start), _col(end)
    if unit in ("year", "y", "yr", "yrs", "years"):
        return F.year(e) - F.year(s)
    if unit in ("quarter", "qtr", "qtrs", "quarters"):
        return (F.year(e) - F.year(s)) * 4 + (F.quarter(e) - F.quarter(s))
    if unit in ("month", "mon", "mons", "months"):
        return (F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))
    if unit in ("week", "w", "weeks"):
        # Integral like every other unit (Redshift/DuckDB return ints);
        # the division is exact — trunc'd endpoints are 7k days apart.
        return (F.datediff(F.date_trunc("week", e), F.date_trunc("week", s)) / 7).cast("long")
    if unit in ("day", "d", "days"):
        return F.datediff(e.cast("date"), s.cast("date"))
    if unit in ("hour", "h", "hr", "hrs", "hours"):
        trunc_h = (F.unix_timestamp(F.date_trunc("hour", e)) - F.unix_timestamp(F.date_trunc("hour", s))) / 3600
        return trunc_h.cast("long")
    if unit in ("minute", "m", "min", "mins", "minutes"):
        return ((F.unix_timestamp(F.date_trunc("minute", e)) - F.unix_timestamp(F.date_trunc("minute", s))) / 60).cast("long")
    if unit in ("second", "s", "sec", "secs", "seconds"):
        return (F.unix_timestamp(e) - F.unix_timestamp(s)).cast("long")
    raise ValueError(f"unsupported DATEDIFF unit: {unit}")


def convert_timezone(source_tz: str, target_tz: str, ts: ColumnOrName) -> Column:
    """Redshift CONVERT_TIMEZONE('src', 'tgt', ts): interpret the naive
    timestamp as src-zone local time, render it as tgt-zone local time.

    Spark spelling: to_utc_timestamp (src local → UTC instant) then
    from_utc_timestamp (UTC instant → tgt local). Both use the session's
    IANA tzdata, including DST rules, matching Redshift/DuckDB behavior
    for named zones. DuckDB oracle: timezone(tgt, timezone(src, ts)).
    """
    return F.from_utc_timestamp(F.to_utc_timestamp(_col(ts), source_tz), target_tz)
