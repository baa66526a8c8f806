"""awswrangler-shaped namespace: ``wr.redshift`` ->
:mod:`aws_sdk_pandas_spark.databases.redshift` (JDBC reads, staged
COPY/UNLOAD semantics, MERGE-based upserts)."""

from __future__ import annotations

from aws_sdk_pandas_spark.databases.redshift import (
    connect,
    connect_temp,
    copy,
    copy_from_files,
    read_sql_query,
    read_sql_table,
    to_sql,
    unload,
    unload_to_files,
)

__all__ = [
    "connect",
    "connect_temp",
    "copy",
    "copy_from_files",
    "read_sql_query",
    "read_sql_table",
    "to_sql",
    "unload",
    "unload_to_files",
]
