"""JDBC database connector family (reference: awswrangler/_databases.py
plus the per-engine modules mysql.py, postgresql.py, oracle.py,
sqlserver.py, redshift/).

The reference moves rows through DB-API cursors (fetchmany -> Arrow ->
pandas, `_databases.py:272-354`); Spark-first that is `spark.read.jdbc`
(partitioned parallel reads) and `DataFrameWriter.jdbc` (parallel batched
inserts).  The upsert-mode matrix each engine module exposes is
implemented engine-agnostically: read target -> merge in Spark ->
write back (the reference's staging-table + MERGE pattern,
redshift/_utils.py:173-211, expressed as one Spark plan).
"""

from __future__ import annotations

from aws_sdk_pandas_spark.databases import (
    mysql,
    oracle,
    postgresql,
    redshift,
    sqlserver,
)
from aws_sdk_pandas_spark.databases.core import (
    ConnectionConfig,
    connect,
    read_sql_query,
    read_sql_table,
    to_sql,
)

__all__ = [
    "ConnectionConfig",
    "connect",
    "mysql",
    "oracle",
    "postgresql",
    "read_sql_query",
    "read_sql_table",
    "redshift",
    "sqlserver",
    "to_sql",
]
