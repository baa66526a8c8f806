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


def lint(df: DataFrame) -> list[dict]:
    """Structured scale-lint of a DataFrame's physical plan: returns a
    list of ``{"code", "severity", "detail"}`` findings — the
    machine-readable version of the eyeball pass over ``.explain()``
    every 100 TB job deserves before it ships.  Empty list = clean.

    Checks (severity):
    - ``cartesian_product`` / ``nested_loop_join`` (error): O(n·m)
      joins that melt at scale — usually a missing equi-condition or a
      non-broadcastable range predicate (`interval_join` /
      `salted_join` are the rewrites).
    - ``python_row_udf`` (error): row-at-a-time Python in the hot path
      (BatchEvalPython) — 10-100× slower than an Arrow-batched kernel.
    - ``single_partition_exchange`` (warn): a global sort/window funnel
      (`Exchange SinglePartition` feeding Sort/Window) — fine for a
      one-row summary, fatal for row-volume data; `global_prefix_sum`
      and `uniform_sample_k` are the scale-safe rewrites.  Final
      single-row aggregations are NOT flagged.
    - ``arrow_python_udf`` (info): Arrow-batched Python present — the
      acceptable slow path; worth knowing it's there.
    - ``many_exchanges`` (info): > 6 shuffle exchanges in one plan —
      look for a missing co-partitioning or a reusable exchange.
    """
    plan = executed_plan(df)
    findings: list[dict] = []

    def add(code: str, severity: str, detail: str) -> None:
        findings.append({"code": code, "severity": severity, "detail": detail})

    if "CartesianProduct" in plan:
        add("cartesian_product", "error",
            "CartesianProduct node: O(n*m) join — add an equi-key or bucketed rewrite")
    if "BroadcastNestedLoopJoin" in plan:
        add("nested_loop_join", "error",
            "BroadcastNestedLoopJoin: per-row scan of the broadcast side — "
            "usually a non-equi predicate; see interval_join/asof_join rewrites")
    if "BatchEvalPython" in plan:
        add("python_row_udf", "error",
            "BatchEvalPython: row-at-a-time Python UDF in the plan — "
            "rewrite with built-in Columns or an Arrow-batched pandas UDF")
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        add("arrow_python_udf", "info",
            "Arrow-batched Python stage present (acceptable slow path)")
    # a SinglePartition exchange feeding Sort/Window is the global-order
    # funnel; feeding a final aggregate of a one-row summary is benign
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = "\n".join(lines[max(0, i - 4):i])
            if "Window" in above or ("Sort" in above and "TakeOrdered" not in above):
                add("single_partition_exchange", "warn",
                    "global Sort/Window funnels ALL rows through one task — "
                    "use global_prefix_sum / TakeOrderedAndProject rewrites")
                break
    n_ex = count_exchanges(df)
    if n_ex > 6:
        add("many_exchanges", "info",
            f"{n_ex} shuffle exchanges in one plan — check for reusable "
            "partitioning or a missing broadcast")
    return findings
