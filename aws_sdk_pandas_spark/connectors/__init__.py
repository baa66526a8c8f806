"""Specialty-store connectors re-expressed over the dataset layer
(reference: awswrangler/dynamodb/, timestream/, opensearch/, neptune/).

Without live services, each connector keeps the reference's API shape and
query semantics — key conditions, filter expressions, DSL compilation,
graph frames — executing against Spark tables/datasets.  Pointing them at
real services is a transport swap (DataSourceV2 / connector jar), not a
semantic change.
"""

from __future__ import annotations

from aws_sdk_pandas_spark.connectors import dynamodb, neptune, opensearch, timestream

__all__ = ["dynamodb", "neptune", "opensearch", "timestream"]
