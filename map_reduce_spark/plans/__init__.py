"""Plan inspection utilities — how the engine verifies its own scale
posture (pushdown, pruning, join strategy, partial aggregation).

Used by tests/test_plans.py to LOCK these properties structurally; use
``describe(df)`` interactively to audit any operator's physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def describe(df: DataFrame) -> dict:
    """Scale-posture summary of a plan: what scans/shuffles/joins it
    contains and whether pushdown applied."""
    plan = executed_plan(df)
    return {
        "scans": plan.count("Scan parquet"),
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "hash_aggregates": plan.count("HashAggregate"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
    }
