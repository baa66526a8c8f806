"""awswrangler-shaped namespace: ``wr.mysql`` ->
:mod:`aws_sdk_pandas_spark.databases.mysql` (JDBC + the five upsert modes)."""

from __future__ import annotations

from aws_sdk_pandas_spark.databases.mysql import (
    connect,
    read_sql_query,
    read_sql_table,
    to_sql,
)

__all__ = ["connect", "read_sql_query", "read_sql_table", "to_sql"]
