"""awswrangler-shaped namespace: ``wr.sqlserver`` ->
:mod:`aws_sdk_pandas_spark.databases.sqlserver` (JDBC + MERGE upsert)."""

from __future__ import annotations

from aws_sdk_pandas_spark.databases.sqlserver import (
    connect,
    read_sql_query,
    read_sql_table,
    to_sql,
)

__all__ = ["connect", "read_sql_query", "read_sql_table", "to_sql"]
