"""Data API service module (reference: awswrangler/data_api/__init__.py
— ``rds`` and ``redshift`` submodules).

The reference speaks the RDS/Redshift **Data API** — the same SQL
surface as JDBC, transported over HTTPS with typed parameter dicts
(``[{"name": n, "value": {"stringValue": v}}]``).  Here the transport is
the `databases` JDBC family: a ``resource_arn`` that is a ``jdbc:`` URL
connects directly, any other ARN maps deterministically to an embedded
in-memory Derby database — a REAL executable SQL engine, so the whole
connect → to_sql → parameterized read_sql_query path runs end-to-end in
tests instead of being a string veneer.  The typed-parameter dialect is
translated faithfully (stringValue/longValue/doubleValue/booleanValue/
isNull).
"""

from aws_sdk_pandas_spark.data_api import rds, redshift

__all__ = ["rds", "redshift"]
