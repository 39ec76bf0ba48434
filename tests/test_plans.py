"""Physical-plan regression guards — the SCALE.md §3 audit, executable.

Each assertion pins a plan property that a future refactor could silently
lose without failing any value-correctness test: filters reaching the
parquet scan, range joins staying equality-shaped (never a nested-loop
cross product), dimension joins staying broadcast. Plan text comes from
the executed plan (post-AQE), same surface the audit reads.
"""

from __future__ import annotations

import re

import pytest

from dariadb_spark.registry import REGISTRY


def _plan(spark, sf_dir, name: str) -> str:
    # default maxMetadataStringLength=100 truncates PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name", ["ext_rate", "ext_gap_fill", "ext_interpolate", "ext_anomaly_zscore"]
)
def test_resample_filters_reach_scan(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    pushed = "".join(re.findall(r"PushedFilters: \[[^\n]*", plan))
    assert "In(user_id," in pushed, pushed
    # raw-ts interval bounds (ns) must prune row groups at the scan
    assert "GreaterThanOrEqual(ts," in pushed, pushed
    assert "LessThanOrEqual(ts," in pushed, pushed


def test_range_context_is_equality_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_range_context")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_revenue_by_nation_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ext_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3, plan  # cust/nation/region
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_scheme_resolve_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scheme_resolve")
    assert "BroadcastHashJoin" in plan, plan


def test_pivot_schema_is_fixed(spark, sf_dir):
    # explicit pivot value list → output schema is a constant of the
    # plan, never of the data (the drift hazard an implicit pivot has)
    df = REGISTRY["ext_pivot_flags"].fn(spark, sf_dir)
    assert df.columns == [
        "id", "n_click", "n_view", "n_signup", "n_purchase", "n_error",
    ]
