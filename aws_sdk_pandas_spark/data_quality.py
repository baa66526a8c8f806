"""awswrangler-shaped namespace: ``wr.data_quality`` ->
:mod:`aws_sdk_pandas_spark.dq` (DQDL-style rulesets evaluated as one
aggregation pass)."""

from __future__ import annotations

from aws_sdk_pandas_spark.dq import (
    create_recommendation_ruleset,
    create_ruleset,
    evaluate_ruleset,
    get_ruleset,
    update_ruleset,
)

__all__ = [
    "create_recommendation_ruleset",
    "create_ruleset",
    "evaluate_ruleset",
    "get_ruleset",
    "update_ruleset",
]
