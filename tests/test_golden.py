"""Golden-file test (SURVEY.md §5): the flagship query's sf0.001 output
pinned exactly. Catches any silent semantic drift in the core path
(catalog, dialect casts, aggregation) independent of the DuckDB oracle."""

from __future__ import annotations

import json
import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "flagship_sf0.001.json")


def _flagship_rows(spark):
    from sql_redshift_etl_spark.plans.registry import all_queries

    df = all_queries()["flagship_pricing_summary"].builder(spark, "/root/testdata/sf0.001")
    return [
        {k: (round(v, 10) if isinstance(v, float) else v) for k, v in r.asDict().items()}
        for r in df.collect()
    ]


def test_flagship_matches_golden(spark):
    rows = _flagship_rows(spark)
    if not os.path.exists(GOLDEN_PATH):  # first run pins the golden
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert rows == golden
