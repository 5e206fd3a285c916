"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB bit-for-bit (canonical multiset compare) on the
local fixtures. Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from sql_redshift_etl_spark.oracle import compare_frames
from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_DIR)
    spdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spdf) >= 0  # smoke: runs, stable schema
        assert list(spdf.columns), f"{name}: no columns"
        return
    dpdf = duck.execute(q.oracle).df()
    report = compare_frames(spdf, dpdf)
    assert report["columns_match"], f"{name}: columns {report['spark_cols']} vs {report['duck_cols']}"
    assert report["rowcount_match"], f"{name}: rows {report['spark_rows']} vs {report['duck_rows']}"
    assert report["values_match"], f"{name}: value mismatch, first diffs: {report.get('first_diffs')}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_registry_consistency():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "flagship_pricing_summary" in qs
