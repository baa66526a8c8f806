"""awswrangler-shaped namespace: ``wr.oracle`` ->
:mod:`aws_sdk_pandas_spark.databases.oracle` (JDBC + MERGE upsert)."""

from __future__ import annotations

from aws_sdk_pandas_spark.databases.oracle import (
    connect,
    read_sql_query,
    read_sql_table,
    to_sql,
)

__all__ = ["connect", "read_sql_query", "read_sql_table", "to_sql"]
