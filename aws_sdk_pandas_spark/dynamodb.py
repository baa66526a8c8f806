"""awswrangler-shaped namespace: ``wr.dynamodb`` ->
:mod:`aws_sdk_pandas_spark.connectors.dynamodb`."""

from __future__ import annotations

from aws_sdk_pandas_spark.connectors.dynamodb import (
    delete_items,
    execute_statement,
    get_table,
    put_csv,
    put_df,
    put_items,
    put_json,
    read_items,
    read_partiql_query,
)

__all__ = [
    "delete_items",
    "execute_statement",
    "get_table",
    "put_csv",
    "put_df",
    "put_items",
    "put_json",
    "read_partiql_query",
    "read_items",
]
