"""awswrangler-shaped namespace: ``wr.opensearch`` ->
:mod:`aws_sdk_pandas_spark.connectors.opensearch`."""

from __future__ import annotations

from aws_sdk_pandas_spark.connectors.opensearch import (
    connect,
    create_collection,
    create_index,
    delete_index,
    index_csv,
    index_df,
    index_documents,
    index_json,
    search,
    search_by_sql,
)

__all__ = [
    "connect",
    "create_collection",
    "create_index",
    "delete_index",
    "index_csv",
    "index_documents",
    "index_df",
    "index_json",
    "search",
    "search_by_sql",
]
