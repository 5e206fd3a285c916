"""Local mirror of the driver's DuckDB oracle check.

The verify driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet fixtures, then
compares row-count + schema + order-insensitive value-hash. This module
reproduces that comparison locally (strictly: canonical stringification of
every cell, multiset equality) so regressions are caught before submission.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal
from typing import Any

import duckdb
import pandas as pd

from sql_redshift_etl_spark.catalog import TABLES


def register_duckdb_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table = directory of parts
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")


def canon_cell(v: Any) -> str:
    """Canonical, engine-independent rendering of one value."""
    if v is None:
        return "∅"
    if not isinstance(v, (list, tuple)) and type(v).__name__ != "ndarray":
        try:
            if pd.isna(v):  # unify None / NaN / NaT across engines
                return "∅"
        except (TypeError, ValueError):
            pass
    if isinstance(v, float):
        # STRICT (round 5): no integral-float→int absorption. The driver's
        # hash renders cells str()-faithfully, so DuckDB HUGEINT-as-float64
        # `353.0` vs Spark bigint `353` IS a driver mismatch (the q12 red
        # row, r4) — the lenient mirror masked it. Queries must cast both
        # sides to the same type; the mirror now fails exactly when the
        # driver would.
        return repr(v)  # shortest round-trip — bitwise faithful; str==repr
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, int):
        return f"i{v}"
    if isinstance(v, Decimal):
        # STRICT: an uncast DECIMAL column (Spark → decimal.Decimal objects,
        # DuckDB .df() → float64) renders scale-faithfully ('3.50' ≠ 3.5)
        # like the driver would see it — cast to DOUBLE/BIGINT in the query
        # instead of relying on absorption here.
        return "d" + str(v)
    if isinstance(v, bytes):
        return "x" + v.hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # STRICT: a bare date renders as '2024-01-01' while an engine that
        # promotes DATE to midnight datetime renders '…T00:00:00' — the
        # driver distinguishes those strings, so we must too. Cast both
        # sides to TIMESTAMP (or string) in the query pair.
        return v.isoformat()
    if hasattr(v, "isoformat"):  # datetime.datetime / datetime.time
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(float(x) if isinstance(x, float) or "float" in type(x).__name__ else x) for x in v) + "]"
    if type(v).__module__ == "numpy":  # numpy scalar
        return canon_cell(v.item())
    return "s" + str(v)


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = sorted(tuple(canon_cell(v) for v in row) for row in out.itertuples(index=False, name=None))
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict[str, Any]:
    sc, srows = canon_frame(spark_pdf)
    dc, drows = canon_frame(duck_pdf)
    report: dict[str, Any] = {
        "columns_match": sc == dc,
        "rowcount_match": len(srows) == len(drows),
        "values_match": srows == drows,
        "spark_cols": sc,
        "duck_cols": dc,
        "spark_rows": len(srows),
        "duck_rows": len(drows),
    }
    if not report["values_match"] and report["rowcount_match"] and report["columns_match"]:
        # Multiset difference, not positional zip: one differing row
        # shifts sort alignment and a zip would report bogus pairs of
        # rows that are actually present in both frames.
        from collections import Counter

        s_only = list((Counter(srows) - Counter(drows)).elements())
        d_only = list((Counter(drows) - Counter(srows)).elements())
        report["first_diffs"] = {"spark_only": s_only[:3], "duck_only": d_only[:3]}
    return report
