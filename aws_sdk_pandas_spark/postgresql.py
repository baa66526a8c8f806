"""awswrangler-shaped namespace: ``wr.postgresql`` ->
:mod:`aws_sdk_pandas_spark.databases.postgresql` (JDBC + ON CONFLICT upsert)."""

from __future__ import annotations

from aws_sdk_pandas_spark.databases.postgresql import (
    connect,
    read_sql_query,
    read_sql_table,
    to_sql,
)

__all__ = ["connect", "read_sql_query", "read_sql_table", "to_sql"]
