"""awswrangler-shaped namespace: ``wr.cloudwatch`` -> the Insights-language
compiler and raw-event operators in :mod:`aws_sdk_pandas_spark.logs`."""

from __future__ import annotations

from aws_sdk_pandas_spark.logs import (
    describe_log_streams,
    filter_log_events,
    read_logs,
    run_query,
    start_query,
    wait_query,
)

__all__ = [
    "start_query",
    "wait_query",
    "run_query",
    "read_logs",
    "describe_log_streams",
    "filter_log_events",
]
