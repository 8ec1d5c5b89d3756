"""Physical-plan audit helpers (SURVEY §4).

The reference has no optimizer to inspect; this engine's optimizer is
Catalyst, so "optimization work" here means *verifying* that each
operator's plan has the shape we want at 100 TB: filters and column
pruning pushed into the parquet scan, small dims broadcast, aggregates
with map-side partials, top-k as TakeOrderedAndProject, wide codegen
stages. These helpers turn ``explain`` output into assertable facts —
used by tests/test_plans.py and the per-round scale audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    """Execute the DataFrame's own QueryExecution (collect) and return
    the AQE *final* physical plan — the only place codegen stage
    boundaries are visible under AQE. Small results only (the collect
    is on this df; a sink write would plan a separate execution whose
    final plan is not reachable from here)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    """Plan-shape facts for scale assertions."""
    plan = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    return {
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "reads_pruned_schema": "ReadSchema" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in simple
        or "BroadcastNestedLoopJoin" in simple,
        "has_sort_merge_join": "SortMergeJoin" in simple,
        "has_partial_agg": "partial_" in simple or "HashAggregate" in simple,
        "has_take_ordered": "TakeOrderedAndProject" in simple,
        "n_exchanges": simple.count("Exchange"),
        "has_python_udf": "BatchEvalPython" in simple
        or "ArrowEvalPython" in simple
        or "MapInPandas" in simple
        or "FlatMapGroupsInPandas" in simple,
    }
