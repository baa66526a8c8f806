"""Plan inspection helpers: assert that the physical plan has the shape
you want (pushdown reached the scan, no stray shuffles, broadcast where
expected).  Used by tests and by bench iteration."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return formatted_plan(df).count("Exchange")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the scan nodes (empty string if none)."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema line(s) — verify column pruning reached the scan."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    )


_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string — call after an action so AQE has
    re-planned (the formatted explain can show the pre-AQE plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of each join node in the executed plan."""
    plan = executed_plan(df)
    return {j: plan.count(j) for j in _JOIN_NODES if j in plan}


def assert_scale_safe(df: DataFrame) -> None:
    """Raise if the plan contains nodes that do not survive a scale-up:
    cartesian products, nested-loop joins, or row-at-a-time Python UDFs.
    Use in tests to pin an operator's scale posture."""
    plan = executed_plan(df)
    smells = [
        s
        for s in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
        if s in plan
    ]
    if smells:
        raise AssertionError(f"plan contains scale smells {smells}:\n{plan[:2000]}")
