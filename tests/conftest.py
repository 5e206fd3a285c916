from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sql_redshift_etl_spark.session import get_spark

    spark = get_spark("sql-redshift-etl-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from sql_redshift_etl_spark.oracle import register_duckdb_views

    con = duckdb.connect()
    register_duckdb_views(con, SF_DIR)
    yield con
    con.close()
