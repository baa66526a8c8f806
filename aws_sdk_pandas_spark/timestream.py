"""awswrangler-shaped namespace: ``wr.timestream`` ->
:mod:`aws_sdk_pandas_spark.connectors.timestream`."""

from __future__ import annotations

from aws_sdk_pandas_spark.connectors.timestream import (
    batch_load,
    batch_load_from_files,
    create_database,
    create_table,
    delete_database,
    delete_table,
    list_databases,
    list_tables,
    query,
    unload,
    unload_to_files,
    wait_batch_load_task,
    write,
)

__all__ = [
    "create_database",
    "create_table",
    "delete_database",
    "delete_table",
    "list_databases",
    "list_tables",
    "query",
    "write",
    "batch_load",
    "batch_load_from_files",
    "wait_batch_load_task",
    "unload_to_files",
    "unload",
]
