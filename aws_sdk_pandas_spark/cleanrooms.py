"""Clean Rooms protected queries (reference: awswrangler/cleanrooms/
_read.py:29 ``read_sql_query``, _utils.py ``wait_query``).

The reference starts a protected query in a Clean Rooms collaboration
and reads the S3 CSV output; the privacy layer lives server-side.  Here
the privacy layer IS the engine content, so it runs locally: a query
executes only under an **analysis rule** (the public Clean Rooms model)
and the result is post-processed with the same protections the service
applies —

- ``LIST`` rule: row-level output restricted to ``allowed_columns``
  (schema-checked after analysis, before any execution).
- ``AGGREGATION`` rule: the query plan MUST aggregate (no row-level
  passthrough — verified on Spark's analyzed logical plan), output
  dimensions are restricted to ``allowed_columns``, and every output row
  whose ``count_column`` falls below ``k_threshold`` is SUPPRESSED —
  Clean Rooms' minimum-aggregation constraint, the k-anonymity guard
  that keeps a group of one from leaking a row.
- ``CUSTOM`` rule: only pre-approved analysis templates run; free SQL is
  rejected.

Scale shape: enforcement adds at most one codegen filter on an already-
aggregated (bounded) result — validation is driver-side plan/schema
inspection, never a data pass.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_sdk_pandas_spark.exceptions import InvalidArgument, QueryFailed

# module registry of analysis templates: arn -> {"sql": ..., "rule": ...}
_TEMPLATES: dict[str, dict[str, Any]] = {}


def create_analysis_template(
    arn: str, sql: str, *, analysis_rule: dict[str, Any] | None = None
) -> str:
    """Register a pre-approved analysis template (the collaboration-owner
    side of the CUSTOM rule; reference: the ``analysis_template_arn``
    path of cleanrooms/_read.py:29)."""
    _TEMPLATES[arn] = {"sql": sql, "rule": analysis_rule}
    return arn


def delete_analysis_template(arn: str) -> None:
    _TEMPLATES.pop(arn, None)


def _substitute_named(sql: str, params: dict[str, Any] | None) -> str:
    """Client-side ``:name`` substitution — the reference's documented
    contract (values for varchar must arrive pre-quoted)."""
    if not params:
        return sql
    import re

    out = sql
    for name in sorted(params, key=len, reverse=True):
        out = re.sub(rf":{re.escape(name)}\b", str(params[name]), out)
    return out


_PASSTHROUGH_NODES = {
    "Project", "Sort", "GlobalLimit", "LocalLimit", "Filter", "Distinct",
    "SubqueryAlias", "Offset",
}


def _root_aggregate(df: DataFrame):
    """The Aggregate node at the ROOT of the analyzed plan (unwrapping
    only order/limit/projection shells), or None.  A match anywhere in
    the plan is NOT enough — a subquery's Aggregate must not launder a
    row-level outer query past the rule."""
    plan = df._jdf.queryExecution().analyzed()
    for _ in range(32):
        name = plan.getClass().getSimpleName()
        if name == "Aggregate":
            return plan
        if name == "WithCTE":
            # WithCTE children = cteDefs :+ mainPlan — descend into the
            # MAIN plan (last child), not a CTE definition
            plan = plan.children().apply(plan.children().size() - 1)
            continue
        if name in _PASSTHROUGH_NODES and plan.children().size() == 1:
            plan = plan.children().apply(0)
            continue
        return None
    return None


def _is_real_count_column(agg_plan, count_col: str) -> bool:
    """True only when ``count_col`` is EXACTLY a COUNT aggregate (the
    expression tree is Alias(AggregateExpression(Count)) / a bare Count)
    in the root Aggregate.  A class-name check, not a substring match —
    ``999 + 0*COUNT(*)`` contains a count but is NOT a count, and must
    not satisfy the k-threshold."""
    try:
        exprs = agg_plan.aggregateExpressions()
        for i in range(exprs.size()):
            e = exprs.apply(i)
            if e.name() != count_col:
                continue
            node = e
            if node.getClass().getSimpleName() == "Alias":
                node = node.child()
            if node.getClass().getSimpleName() != "AggregateExpression":
                return False
            return node.aggregateFunction().getClass().getSimpleName() == "Count"
    except Exception:
        return False
    return False


def _enforce(df: DataFrame, rule: dict[str, Any] | None, sql: str) -> DataFrame:
    if rule is None:
        return df
    rtype = str(rule.get("type", "")).upper()
    if rtype == "LIST":
        allowed = set(rule.get("allowed_columns") or [])
        extra = [c for c in df.columns if c not in allowed]
        if extra:
            raise InvalidArgument(
                f"LIST analysis rule violation: columns {extra} are not in "
                f"allowed_columns {sorted(allowed)}"
            )
        return df
    if rtype == "AGGREGATION":
        agg_plan = _root_aggregate(df)
        if agg_plan is None:
            raise InvalidArgument(
                "AGGREGATION analysis rule violation: the query itself must "
                "aggregate (no row-level output permitted; an Aggregate inside "
                "a subquery does not qualify)"
            )
        count_col = rule.get("count_column", "n")
        if count_col not in df.columns:
            raise InvalidArgument(
                f"AGGREGATION analysis rule requires the output to carry the "
                f"{count_col!r} count column so the k-threshold can be enforced"
            )
        if not _is_real_count_column(agg_plan, count_col):
            raise InvalidArgument(
                f"AGGREGATION analysis rule: column {count_col!r} must be a "
                "genuine COUNT aggregate of the query's own grouping — a "
                "constant or non-count expression cannot satisfy the "
                "k-threshold"
            )
        allowed = rule.get("allowed_columns")
        if allowed is not None:
            extra = [c for c in df.columns if c != count_col and c not in set(allowed)]
            if extra:
                raise InvalidArgument(
                    f"AGGREGATION analysis rule violation: output columns {extra} "
                    f"are not in allowed_columns {sorted(set(allowed))}"
                )
        k = int(rule.get("k_threshold", 2))
        # the minimum-aggregation constraint: underfilled groups suppressed
        return df.where(F.col(count_col) >= F.lit(k))
    if rtype == "CUSTOM":
        raise InvalidArgument(
            "CUSTOM analysis rule: free SQL is rejected; run a registered "
            "analysis template via analysis_template_arn"
        )
    raise InvalidArgument(f"unknown analysis rule type {rule.get('type')!r}")


def read_sql_query(
    spark: SparkSession,
    sql: str | None = None,
    analysis_template_arn: str | None = None,
    *,
    params: dict[str, Any] | None = None,
    analysis_rule: dict[str, Any] | None = None,
    chunksize: int = 0,
) -> DataFrame | Iterator[Any]:
    """Execute a protected query (reference: cleanrooms/_read.py:29 —
    one of ``sql`` / ``analysis_template_arn``, not both; named ``:name``
    client-side params; ``chunksize`` iterator contract).  The analysis
    rule is enforced exactly as the service would: plan/schema validation
    before execution semantics, k-threshold row suppression after."""
    if (sql is None) == (analysis_template_arn is None):
        raise InvalidArgument("supply exactly one of sql / analysis_template_arn")
    rule = analysis_rule
    if analysis_template_arn is not None:
        tpl = _TEMPLATES.get(analysis_template_arn)
        if tpl is None:
            raise InvalidArgument(
                f"unknown analysis template {analysis_template_arn!r}; register "
                "it with create_analysis_template"
            )
        sql = tpl["sql"]
        # the template's own rule governs unless the caller tightens it
        rule = tpl["rule"] if rule is None else rule
        if rule is not None and str(rule.get("type", "")).upper() == "CUSTOM":
            rule = None  # a registered template IS the custom allow-list
    try:
        df = spark.sql(_substitute_named(sql, params))
    except Exception as exc:
        raise QueryFailed(str(exc)) from exc
    df = _enforce(df, rule, sql)
    if chunksize and chunksize > 0:
        from aws_sdk_pandas_spark.sql import _iter_pandas_chunks

        return _iter_pandas_chunks(df, chunksize)
    return df


def wait_query(membership_id: str = "", protected_query_id: str = "", **_ignored: Any) -> dict:
    """reference: cleanrooms/_utils.py ``wait_query`` — protected queries
    here run synchronously inside Spark, so waiting is immediate; kept
    for call-site parity."""
    return {"membershipId": membership_id, "protectedQueryId": protected_query_id, "status": "SUCCESS"}
