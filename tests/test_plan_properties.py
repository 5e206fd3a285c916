"""Plan-shape regression tests: the performance properties docs/SCALE.md
claims are asserted here so a refactor that silently loses pushdown, a
broadcast, or the window group-limit fails CI — correctness tests can't
catch plan regressions."""

from __future__ import annotations

import contextlib
import io

import pytest

from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "flagship_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to parquet scan"
    assert "partial_sum" in plan, "map-side partial aggregation missing"
    assert "ReadSchema" in plan, "no ReadSchema in formatted explain (Spark output changed?)"
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0], "column pruning lost"


def test_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan, "no PushedFilters in formatted explain (Spark output changed?)"
    scan = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan, f"{col} predicate not pushed: {scan}"


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "join_star_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, "nation/region not broadcast"


def test_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "window_topk_per_group")
    assert "WindowGroupLimit" in plan, "rank-limit pushdown (WindowGroupLimit) missing"


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "topk_global_revenue")
    assert "TakeOrderedAndProject" in plan, "global top-k planned as full sort"


def test_semi_join_planned(spark):
    plan = plan_of(spark, "join_semi_exists")
    assert "LeftSemi" in plan


def test_correlated_subquery_decorrelated(spark):
    plan = plan_of(spark, "subquery_correlated_scalar")
    assert "Join" in plan and "HashAggregate" in plan
    assert "Subquery" not in plan, "correlated subquery not decorrelated"


@pytest.mark.parametrize(
    "name", ["flagship_pricing_summary", "join_star_revenue", "events_tumbling_daily"]
)
def test_no_python_udf_in_hot_paths(spark, name):
    plan = plan_of(spark, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"{name}: Python on the hot path ({marker})"
