"""Pre-submit gate: Spark-vs-DuckDB pandas-dtype audit over every
SQL-oracled query.

The driver's correctness hash renders cells str()-faithfully, so dtype
drift splits into two classes:

- RENDERING mismatches (exit 1): the same logical value prints
  differently — int64 vs float64 ('353' vs '353.0', the q12 red row in
  round 4), object(Decimal) vs float64 ('3.50' vs '3.5'), object(date)
  vs datetime64 ('2024-01-01' vs '2024-01-01 00:00:00'), bool vs int.
  These WILL fail the driver even when values are equal. Fix the
  query/oracle pair (CAST both sides).
- REPRESENTATION-ONLY diffs (reported, exit 0): same str() rendering —
  datetime64[ns] vs datetime64[us], int32 vs int64. Driver-tolerated
  (proven: every such query has a green driver row in r1-r4).

Part of the pre-submit gate list (docs/ROUND5.md) alongside pytest,
driver_sim, bench, and the sf1 stress run.
"""
import re
import sys

sys.path.insert(0, "/root/repo")
import duckdb

from sql_redshift_etl_spark.oracle import register_duckdb_views
from sql_redshift_etl_spark.plans.registry import all_queries
from sql_redshift_etl_spark.session import get_spark

_INT = re.compile(r"^u?int\d+$")
_DT = re.compile(r"^datetime64\[(ns|us|ms)(, .+)?\]$")


def _kind(dt: str) -> str:
    if _INT.match(dt):
        return "int"
    if dt.startswith("float"):
        return "float"
    if _DT.match(dt):
        return "datetime"
    if dt == "bool" or dt == "boolean":
        return "bool"
    return dt  # object / category / ... compare verbatim


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dtype-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    rendering, representation, errors = [], [], []
    for name, q in sorted(all_queries().items()):
        if q.oracle is None:
            continue
        try:
            s = q.builder(spark, sf_dir).toPandas()
            d = con.execute(q.oracle).df()
            for c in sorted(s.columns):
                st, dt = str(s[c].dtype), str(d[c].dtype)
                if st == dt:
                    continue
                row = (name, c, st, dt)
                (representation if _kind(st) == _kind(dt) else rendering).append(row)
        except Exception as e:  # noqa: BLE001 — per-query isolation like the driver
            errors.append((name, "<error>", str(e)[:120], ""))
    # r6 pin: the ONLY tolerated representation class is the
    # datetime64 unit (Spark toPandas renders [ns], DuckDB [us] — an
    # engine-level pandas-conversion fact no SQL cast can change; 26
    # green driver rows across r1-r5 prove driver tolerance, e.g.
    # events_sessionize/q3/window_lag_lead). Every OTHER representation
    # diff (int32 vs int64, ...) is alignable with a free cast — r6
    # aligned all 13 standing ones — so new ones fail the gate at
    # authoring time instead of accumulating.
    unpinned = [
        b for b in representation if not (_DT.match(b[2]) and _DT.match(b[3]))
    ]
    for b in representation:
        print("REPR-ONLY" if b in unpinned else "REPR-PINNED", *b)
    for b in rendering:
        print("RENDERING", *b)
    for b in errors:
        print("ERROR    ", *b)
    print(
        f"representation-only: {len(representation)} "
        f"(pinned datetime-unit: {len(representation) - len(unpinned)}, "
        f"unpinned: {len(unpinned)})  "
        f"rendering (driver-red): {len(rendering)}  errors: {len(errors)}"
    )
    spark.stop()
    return 1 if rendering or errors or unpinned else 0


if __name__ == "__main__":
    sys.exit(main())
