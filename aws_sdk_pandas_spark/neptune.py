"""awswrangler-shaped namespace: ``wr.neptune`` ->
:mod:`aws_sdk_pandas_spark.connectors.neptune` (two-DataFrame property-graph
model: vertices ``~id,~label,props`` / edges add ``~from,~to``)."""

from __future__ import annotations

from aws_sdk_pandas_spark.connectors.neptune import (
    BulkLoadParserConfiguration,
    GremlinParser,
    bulk_load,
    bulk_load_from_files,
    connect,
    execute_gremlin,
    execute_opencypher,
    execute_sparql,
    flatten_nested_df,
    to_property_graph,
    to_rdf_graph,
)

__all__ = [
    "execute_gremlin",
    "execute_opencypher",
    "execute_sparql",
    "to_property_graph",
    "to_rdf_graph",
    "connect",
    "bulk_load",
    "bulk_load_from_files",
    "GremlinParser",
    "flatten_nested_df",
    "BulkLoadParserConfiguration",
]
